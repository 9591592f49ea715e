"""Central query registry: name -> (spark_fn, oracle_sql | None).

Each module under operators/ exposes a QUERIES dict of colocated
(spark implementation, DuckDB oracle SQL) pairs; this module merges them
for the driver contract in __spark_entry__.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from .operators import relational, timeseries

    mods = []
    # Module order is deliberate: the driver correctness gate checks the
    # first N registry entries, so modules whose queries were not yet
    # driver-verified (round-1 gate stopped at 50) come first; the
    # long-proven relational/timeseries bulk rotates to the back.
    for name in ("ingest", "geo", "dedup", "similarity", "text", "multimodal", "sampling", "qc", "regression", "indices"):
        try:
            mod = __import__(f"mysense_spark.operators.{name}", fromlist=[name])
            mods.append(mod)
        except ImportError:
            pass
    mods += [relational, timeseries]
    return mods


# Queries hoisted to the very front of the registry: the driver's
# correctness gate checks exactly the FIRST 50 entries, so this list is
# kept to exactly 50. Round-4 layout: (a) the 8 queries fixed/changed/new
# this round (the r3 station_calibration red now sin-free, the ADVICE
# rounding-parity fixes, the oracle-ized HLL query, the new REST pull,
# the bm25 re-plan); (b) the 4 rows whose last driver evidence is round 1
# (displaced from the r3 window by its 50-row cap); (c) every row whose
# latest driver evidence is round 2, oldest-evidence-first in registry
# order. Eight unchanged r2-green rows (multilinear_regression,
# minmax_normalize, daily_qc_report, aqi_index, lki_index, aqhi_index,
# caqi_index, sensor_set_diff) deliberately roll to round 5 — the window
# is full; every row behind it carries round-2 or round-3 evidence.
_PRIORITY = (
    # (a) fixed / changed / new in round 4
    "station_calibration",
    "sensorthings_pull",
    "approx_distinct_users",
    "cascade_rollup",
    "region_revenue",
    "spatial_pairs",
    "neighbour_search",
    "bm25_search",
    "duplicate_spans",
    "dedup_keep_best",
    "embedding_dim_stats",
    "incremental_dedup",
    # (b) last driver evidence: round 1
    "asof_align",
    "mode_per_user",
    "coverage",
    "dedup_upsert",
    # (c) last driver evidence: round 2
    "ttn_decode",
    "csv_ingest",
    "geofence_transitions",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_neardup",
    "neardup_clusters",
    "decontam_report",
    "knn_bruteforce",
    "ann_ivf",
    "cluster_stats",
    "kmeans_train",
    "text_stats",
    "pii_scrub",
    "tfidf_top_terms",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "blob_metadata",
    "frame_sample",
    "hash_sample",
    "corpus_build",
    "temperature_mix",
    "stratified_sample",
    "range_validate",
    "tristate_validity",
    "pm_mass_fill",
    "zscore_outliers",
    "grubbs_outliers",
    "linear_regression",
    "ols_summary",
    "sigma_band",
)


def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    out: dict[str, tuple] = {}
    for mod in _modules():
        for name, pair in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = pair
    front = {n: out[n] for n in _PRIORITY if n in out}
    rest = {n: p for n, p in out.items() if n not in front}
    return {**front, **rest}


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
