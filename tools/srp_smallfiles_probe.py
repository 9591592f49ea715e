"""SRP small-files boundary probe (r13, VERDICT item #5): a long-lived
`run_srp_index_stream` accumulates O(appends) parquet files per hot
(tbl, bucket) directory — the documented cost of the append-only
maintenance story. This tool measures what that actually costs a
probe, so SCALING.md can state a compaction cadence from numbers
instead of hand-waving.

Method: the SAME corpus is written into the (tbl, bucket) layout as
k = 1 / 32 / 256 appends (k=1 IS the compacted rebuild — signatures
are a pure function of the vectors, so the rebuild is byte-equivalent
to the appends it replaces). Against each layout the deployed probe
path runs: a realistic radius-1 multi-probe list for the 5 query
vectors through read_srp_buckets + a pooled count, timed over
`--reps` repetitions (median reported; first rep listed separately —
file listing is the cost under test, and FileStatusCache makes later
reps the warm number).

Usage: python tools/srp_smallfiles_probe.py [sf_dir] [out_json]
           [--appends 1,32,256] [--reps 3]
Defaults: /tmp/scale/sf1.0, /tmp/srp_smallfiles.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/tmp/scale/sf1.0"
    out_path = args[1] if len(args) > 1 else "/tmp/srp_smallfiles.json"
    appends = [1, 32, 256]
    if "--appends" in sys.argv:
        appends = [int(x) for x in sys.argv[sys.argv.index("--appends") + 1].split(",")]
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 3

    from pyspark.sql import functions as F

    from mysense_spark.operators.similarity import (
        _srp_probe_variants,
        _vectors,
        read_srp_buckets,
        srp_signatures,
        write_srp_partitioned,
    )
    from mysense_spark.session import get_spark

    spark = get_spark("srp-smallfiles-probe")
    vecs = _vectors(spark, sf_dir)
    n = vecs.count()

    qsigs = srp_signatures(vecs.where(F.col("vec_id") < 5)).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    probes = [
        (r["tbl"], r["bucket"])
        for r in _srp_probe_variants(qsigs, 8, 1).distinct().collect()
    ]

    def count_files(path: str) -> int:
        total = 0
        for _root, _dirs, fs in os.walk(path):
            total += sum(1 for f in fs if f.endswith(".parquet"))
        return total

    results = []
    base = "/tmp/srp_smallfiles_layouts"
    shutil.rmtree(base, ignore_errors=True)
    for k in appends:
        path = f"{base}/k{k}"
        t0 = time.monotonic()
        # contiguous vec_id slices: each append is one micro-batch of
        # the stream (foreachBatch appends exactly like this)
        step = (n + k - 1) // k
        for i in range(k):
            batch = vecs.where(
                (F.col("vec_id") >= i * step) & (F.col("vec_id") < (i + 1) * step)
            )
            write_srp_partitioned(batch, path, append=i > 0)
        build_sec = time.monotonic() - t0
        # drop the file-listing caches so the first probe pays the real
        # post-restart listing cost for THIS layout
        spark.catalog.clearCache()
        try:
            # Spark-PRIVATE listing cache (r14 advice: the static
            # forwarder can move across Spark versions — degrade
            # loudly to a fresh session instead of crashing)
            spark._jvm.org.apache.spark.sql.execution.datasources.FileStatusCache.resetForTesting()
        except Exception as e:  # py4j errors don't subclass anything useful
            print(
                f"FileStatusCache.resetForTesting unavailable ({e.__class__.__name__});"
                " restarting the SparkSession for a cold listing",
                flush=True,
            )
            spark.stop()
            spark = get_spark("srp-smallfiles-probe")
            vecs = _vectors(spark, sf_dir)  # old session's frames are dead
        times = []
        pool = None
        for _ in range(reps):
            t0 = time.monotonic()
            pool = read_srp_buckets(spark, path, probes).count()
            times.append(round(time.monotonic() - t0, 3))
        row = {
            "appends": k,
            "total_files": count_files(path),
            "build_sec": round(build_sec, 1),
            "probe_rows": pool,
            "probe_sec_cold": times[0],
            "probe_sec_warm_median": sorted(times[1:])[len(times[1:]) // 2]
            if len(times) > 1
            else times[0],
        }
        results.append(row)
        print(row, flush=True)

        # r15: the compaction answer — close out the appended layout
        # (hive-coalesced, then flattened) and re-measure the same
        # probe against each. spark/vecs may have been replaced by the
        # listing-cache fallback above, so re-resolve locally.
        from mysense_spark.operators.similarity import compact_srp_index

        for mode, flatten in (("compact_hive", False), ("compact_flat", True)):
            t0 = time.monotonic()
            compact_srp_index(spark, path, flatten=flatten)
            compact_sec = time.monotonic() - t0
            spark.catalog.clearCache()
            try:
                spark._jvm.org.apache.spark.sql.execution.datasources.FileStatusCache.resetForTesting()
            except Exception as e:
                print(
                    f"FileStatusCache.resetForTesting unavailable ({e.__class__.__name__});"
                    " restarting the SparkSession for a cold listing",
                    flush=True,
                )
                spark.stop()
                spark = get_spark("srp-smallfiles-probe")
            ctimes = []
            cpool = None
            for _ in range(reps):
                t0 = time.monotonic()
                cpool = read_srp_buckets(spark, path, probes).count()
                ctimes.append(round(time.monotonic() - t0, 3))
            assert cpool == pool, (mode, cpool, pool)  # compaction must be invisible
            crow = {
                "appends": k,
                "mode": mode,
                "total_files": count_files(path),
                "compact_sec": round(compact_sec, 1),
                "probe_rows": cpool,
                "probe_sec_cold": ctimes[0],
                "probe_sec_warm_median": sorted(ctimes[1:])[len(ctimes[1:]) // 2]
                if len(ctimes) > 1
                else ctimes[0],
            }
            results.append(crow)
            print(crow, flush=True)

    out = {
        "sf_dir": sf_dir,
        "n_corpus": n,
        "n_probe_dirs": len(probes),
        "reps": reps,
        "rows": results,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
