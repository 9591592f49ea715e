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
    "semdedup_auto",
    "semdedup_trained",
    "ann_ivf_trained",
    "kit_throttle",
    "alarm_suppression",
    "ann_ivf",
    "ann_recall",
    "kmeans_train",
    "winnow_fingerprints",
    "gopher_filter",
    "bm25_search",
    "tfidf_top_terms",
    # r11-r12 additions tracked per-round from here on
    "ann_ivf_refined",
    "ann_pq",
    "ann_ivfadc",
    "ann_ivfpq",
    "ann_srp",
    "dsir_weights",
    "dsir_resample",
    "media_codec_matrix",
    "media_decode_stats",
    "media_structure",
    "c4_filter",
    "hard_negatives",
]


def minhash_candidate_count(spark, sf_dir: str) -> int:
    """Candidate-pair count of the minhash banding stage, BEFORE Jaccard
    verification — the quantity that must grow near-linearly. Calls the
    SAME stage functions the graded query composes (dedup.minhash_bands /
    minhash_candidates), so a change to the banding configuration is
    automatically what gets measured."""
    from pyspark.sql import functions as F

    from mysense_spark.io import load
    from mysense_spark.operators.dedup import (
        _P,
        _hashed_shingles,
        minhash_bands,
        minhash_candidates,
    )

    doc = load(spark, sf_dir, "documents")
    sh = _hashed_shingles(doc).withColumn("h", F.col("hsh") % _P)
    return minhash_candidates(minhash_bands(sh)).count()


def simhash_candidate_count(spark, sf_dir: str) -> int:
    """Candidate-pair count of the simhash pigeonhole chunk join (the
    set BEFORE the hamming<=3 filter) — via the query's own
    simhash_signatures / simhash_blocks stage functions."""
    from pyspark.sql import functions as F

    from mysense_spark.io import load
    from mysense_spark.operators.dedup import simhash_blocks, simhash_signatures

    doc = load(spark, sf_dir, "documents")
    blocks = simhash_blocks(simhash_signatures(doc))
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


def shingle_join_row_count(spark, sf_dir: str) -> int:
    """Row count of the df-capped hashed-shingle self-equi-join — the
    work unit of the exact-Jaccard verify tier, built with the query's
    own df_capped stage function."""
    from pyspark.sql import functions as F

    from mysense_spark.io import load
    from mysense_spark.operators.dedup import _hashed_shingles, df_capped

    doc = load(spark, sf_dir, "documents")
    sh = df_capped(_hashed_shingles(doc), doc)
    a, b = sh.alias("a"), sh.alias("b")
    return a.join(
        b, (F.col("a.hsh") == F.col("b.hsh")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).count()


def trained_stage_split(spark, sf_dir: str) -> dict:
    """Per-STAGE timing of the trained-codebook semdedup (VERDICT r7 #2:
    'measured α ≤ ~1 for BOTH the assignment and pair stages'): the
    assignment stage (codebook training + both pruned passes) is timed
    through a persisted membership count; the pair stage is timed from
    that cached membership to the dedup output, so neither stage's time
    pollutes the other's exponent."""
    from mysense_spark.operators.similarity import (
        _vectors,
        semdedup_pairs,
        two_level_membership,
    )

    vecs = _vectors(spark, sf_dir)
    t0 = time.monotonic()
    m = two_level_membership(vecs).persist()
    n_assigned = m.count()
    t_assign = time.monotonic() - t0
    n_cells = m.select("cent_id").distinct().count()
    t0 = time.monotonic()
    n_pairs = semdedup_pairs(vecs, membership=m).count()
    t_pairs = time.monotonic() - t0
    m.unpersist()
    return {
        "assign_sec": round(t_assign, 3),
        "pair_sec": round(t_pairs, 3),
        "n_assigned": n_assigned,
        "n_cells": n_cells,
        "n_dropped": n_pairs,
    }


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
        try:
            results[sf_name]["semdedup_trained_stages"] = trained_stage_split(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            results[sf_name]["semdedup_trained_stages"] = {"error": str(exc)[:200]}
        print(sf_name, "semdedup_trained_stages", results[sf_name]["semdedup_trained_stages"], flush=True)
        for cname, fn in (
            ("minhash_candidates", minhash_candidate_count),
            ("simhash_candidates", simhash_candidate_count),
            ("shingle_join_candidates", shingle_join_row_count),
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
