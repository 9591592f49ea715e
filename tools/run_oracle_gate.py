"""Full oracle gate: every registered query vs the DuckDB oracle at the
given SF dir. Usage: python tools/run_oracle_gate.py [sf_dir] [names...]
Prints one line per query and a final PASS/FAIL summary."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from mysense_spark.oracle import compare_frames, run_oracle

    n = e.entry(spark).count()
    print(f"entry rows={n}", flush=True)
    assert n > 0

    fails = []
    qs = e.queries()
    sqls = e.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            pdf = fn(spark, sf_dir).toPandas()
            sql = sqls.get(name)
            if sql:
                res = compare_frames(pdf, run_oracle(sql, sf_dir))
                ok = res.ok
                why = "" if ok else f" ({res})"
            else:
                ok = len(pdf) > 0
                why = "" if ok else " (vacuous)"
        except Exception as exc:
            ok, why = False, f" EXC {exc}"
        dt = time.perf_counter() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name} {dt:.2f}s{why}", flush=True)
        if not ok:
            fails.append(name)
    print(f"SUMMARY: {len(fails)} failures: {fails}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
