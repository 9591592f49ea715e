"""Benchmark runner: executes every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed over a full materialization (count of the result) —
the same work the driver's correctness harness does, minus toPandas.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from mysense_spark.queries import spark_queries
    from mysense_spark.session import get_spark

    spark = get_spark("mysense-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    from mysense_spark.io import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, fn in sorted(spark_queries().items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            # noop sink materializes every column (count() would let
            # Catalyst prune the expensive expressions away)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the bench running; a broken query shows as -1
            timings[name] = -1.0
            print(f"# {name} failed: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "mysense_spark_query_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
