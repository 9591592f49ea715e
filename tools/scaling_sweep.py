"""Scaling-evidence sweep (VERDICT r5 #2): run the expensive dedup/ANN/
text queries at sf0.01 and sf0.1 (driver parquet) and sf1.0
(tools/gen_scale_data.py synthetic, same measured statistics), recording
wall time, output rows, and candidate-pair counts for the LSH tiers.
Results feed SCALING.md; the growth exponent between sf0.1 and sf1.0
(log10 of the ratio at a 10x data step) is the quadratic-stage detector:
~1 = linear, ~2 = quadratic.

Usage: python tools/scaling_sweep.py [out_json]
Assumes /tmp/scale/sf1.0 exists (see gen_scale_data.py).
"""

from __future__ import annotations

import json
import sys
import time

SFS = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1.0": "/tmp/scale/sf1.0",
}

# documents/embeddings/events-only queries (the synthetic sf1.0 dir has no
# TPC-H tables) — the dedup/ANN/text family whose scale posture SCALING.md
# documents
QUERY_NAMES = [
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "dup_ngram_frac",
    "incremental_dedup",
    "cross_split_leakage",
    "decontam_report",
    "source_overlap",
    "embedding_neardup",
    "neardup_clusters",
    "semdedup",
    "ann_ivf",
    "ann_recall",
    "kmeans_train",
    "winnow_fingerprints",
    "gopher_filter",
    "bm25_search",
    "tfidf_top_terms",
]


def minhash_candidates(spark, sf_dir: str) -> int:
    """Candidate-pair count of the minhash banding stage, BEFORE Jaccard
    verification — the quantity that must grow near-linearly."""
    from pyspark.sql import functions as F

    from mysense_spark.io import load
    from mysense_spark.operators.dedup import (
        _HASH_A,
        _HASH_B,
        _N_BANDS,
        _P,
        _ROWS_PER_BAND,
        _hashed_shingles,
    )

    doc = load(spark, sf_dir, "documents")
    sh = _hashed_shingles(doc).withColumn("h", F.col("hsh") % _P)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % _P).alias(f"m{i}")
        for i, (a, b) in enumerate(zip(_HASH_A, _HASH_B))
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    band_keys = F.array(
        *[
            F.concat_ws("_", *[F.col(f"m{b * _ROWS_PER_BAND + r}") for r in range(_ROWS_PER_BAND)])
            for b in range(_N_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.posexplode(band_keys).alias("band_id", "band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )


def simhash_candidates(spark, sf_dir: str) -> int:
    """Candidate-pair count of the simhash pigeonhole chunk join."""
    from pyspark.sql import functions as F

    from mysense_spark.operators.dedup import _simhash_chunked

    chunks = _simhash_chunked(spark, sf_dir)
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )


def shingle_join_candidates(spark, sf_dir: str) -> int:
    """Row count of the df-capped hashed-shingle equi-join — the work
    unit of the exact-Jaccard verify tier."""
    from mysense_spark.operators.dedup import _capped_shingles

    from pyspark.sql import functions as F

    sh = _capped_shingles(spark, sf_dir)
    a = sh.select(F.col("doc_id").alias("d1"), "hsh")
    b = sh.select(F.col("doc_id").alias("d2"), "hsh")
    return a.join(b, "hsh").where(F.col("d1") < F.col("d2")).count()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_sweep.json"
    from mysense_spark.queries import spark_queries
    from mysense_spark.session import get_spark

    spark = get_spark()
    qs = spark_queries()
    results: dict[str, dict] = {}
    for sf_name, sf_dir in SFS.items():
        results[sf_name] = {}
        for name in QUERY_NAMES:
            t0 = time.monotonic()
            try:
                n = qs[name](spark, sf_dir).count()
                dt = time.monotonic() - t0
                results[sf_name][name] = {"sec": round(dt, 3), "rows": n}
            except Exception as exc:  # noqa: BLE001 — record and continue
                results[sf_name][name] = {"error": str(exc)[:200]}
            print(sf_name, name, results[sf_name][name], flush=True)
        for cname, fn in (
            ("minhash_candidates", minhash_candidates),
            ("simhash_candidates", simhash_candidates),
        ):
            t0 = time.monotonic()
            try:
                n = fn(spark, sf_dir)
                results[sf_name][cname] = {"sec": round(time.monotonic() - t0, 3), "pairs": n}
            except Exception as exc:  # noqa: BLE001
                results[sf_name][cname] = {"error": str(exc)[:200]}
            print(sf_name, cname, results[sf_name][cname], flush=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
