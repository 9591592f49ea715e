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
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    """Candidate-pair count of the simhash pigeonhole chunk join (the
    set BEFORE the hamming<=3 filter) — replicated from q_simhash_pairs
    (dedup.py) with the same signature construction."""
    from pyspark.sql import functions as F

    from mysense_spark.io import load
    from mysense_spark.operators.dedup import _SIMHASH_BITS, _WORD_RE

    doc = load(spark, sf_dir, "documents")
    words = F.explode(F.expr(f"regexp_extract_all(text, '{_WORD_RE}', 0)")).alias("word")
    tok = doc.select("doc_id", words).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("word")), 1, 15), 16, 10).cast("long")
    )
    bit_votes = [
        F.sum(F.when(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"v{k}")
        for k in range(_SIMHASH_BITS)
    ]
    votes = tok.groupBy("doc_id").agg(*bit_votes)
    sig = F.lit(0).cast("long")
    for k in range(_SIMHASH_BITS):
        sig = sig + F.when(F.col(f"v{k}") > 0, F.lit(1 << k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    sigs = votes.select("doc_id", sig.alias("simhash"))
    widths = [15, 15, 15, 15]
    starts = [sum(widths[:c]) for c in range(len(widths))]
    chunk_exprs = [
        F.shiftright(F.col("simhash"), s).bitwiseAND(F.lit((1 << w) - 1)).cast("long")
        for s, w in zip(starts, widths)
    ]
    blocks = sigs.select("doc_id", F.posexplode(F.array(*chunk_exprs)).alias("chunk_id", "chunk_val"))
    a, b = blocks.alias("a"), blocks.alias("b")
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
    """Row count of the df-capped hashed-shingle self-equi-join — the
    work unit of the exact-Jaccard verify tier (replicated from
    q_ngram_jaccard_pairs' cap construction)."""
    from pyspark.sql import functions as F

    from mysense_spark.io import load
    from mysense_spark.operators.dedup import _DF_CAP_DEN, _DF_CAP_MIN, _hashed_shingles

    doc = load(spark, sf_dir, "documents")
    raw = _hashed_shingles(doc)
    nd = doc.agg(F.count(F.lit(1)).alias("nd"))
    cap_col = F.greatest(
        F.lit(_DF_CAP_MIN).cast("long"),
        F.expr(f"(nd + {_DF_CAP_DEN - 1}) DIV {_DF_CAP_DEN}"),
    )
    hot = (
        raw.groupBy("hsh")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(nd))
        .where(F.col("df") > cap_col)
    )
    sh = raw.join(F.broadcast(hot.select("hsh")), "hsh", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    return a.join(
        b, (F.col("a.hsh") == F.col("b.hsh")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).count()


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
            ("shingle_join_candidates", shingle_join_candidates),
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
