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
# kept to exactly 50. Round-9 layout:
# (a) 3 rows whose code changed this round — semdedup_trained +
# ann_ivf_trained (the trained codebook rebuilt ORDER-FREE: md5-stride
# level selection instead of the rank window, always-on self-routing
# third level, fused map-side routed argmin; DuckDB mirrors now cover
# the routing too), and dedup_upsert (file selection now reads the
# promote-time _key_ranges.json sidecar with footer fallback);
# (b) the 25 rows whose last driver evidence is round 6 — rolled here
# exactly as planned in the r8 comment (which miscounted them as 26);
# (c) 22 of the 43 rows whose last evidence is round 7, alphabetical.
# The remaining 20 r7-evidence rows (minmax_normalize, modality_mix,
# mode_per_user, multilinear_regression, ngram_jaccard_pairs,
# perplexity_bucket, range_validate, region_revenue, repetition_stats,
# sequence_packing, sigma_band, source_overlap, stratified_sample,
# tfidf_top_terms, token_count, tristate_validity, url_filter,
# vocab_stats, weighted_sample, zscore_outliers) roll to round 10,
# after any r10-changed rows. After this window no registry row's
# driver evidence is older than round 7.
_PRIORITY = (
    # (a) code changed in round 9
    "semdedup_trained",
    "ann_ivf_trained",
    "dedup_upsert",
    # (b) last driver evidence: round 6 (the planned 25)
    "duplicate_spans",
    "tokenizer_fertility",
    "pii_scrub",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "temperature_mix",
    "pm_mass_fill",
    "ols_summary",
    "joost_correction",
    "unpivot_long",
    "failing_sensor_report",
    "distinct_active_kits",
    "wide_view",
    "timeslice_avg",
    "latest_per_user",
    "static_runs",
    "gap_detection",
    "interval_inference",
    "dead_kits",
    "hourly_gapfill",
    "moving_average",
    "static_value_monitor",
    "dead_kit_tiers",
    "crawl_rate_anomalies",
    # (c) last driver evidence: round 7 (first 22, alphabetical)
    "approx_distinct_users",
    "aqhi_index",
    "aqi_index",
    "asof_align",
    "blob_metadata",
    "caqi_index",
    "cascade_rollup",
    "chunk_overlap",
    "corpus_build",
    "coverage",
    "cross_split_leakage",
    "daily_qc_report",
    "decontam_report",
    "dup_ngram_frac",
    "embedding_outliers",
    "fit_apply",
    "frame_sample",
    "grubbs_outliers",
    "hash_sample",
    "linear_regression",
    "lki_index",
    "media_embed",
)


def _hygienic(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the PREVIOUS query's tracked caches when a DIFFERENT
    query enters (see cache.py): live cached storage stays bounded by
    one query's working set across any sweep, each query's own persists
    survive through its collect, and re-running the same query stays
    cache-warm."""
    import functools

    from .cache import begin_query

    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        begin_query(fn.__qualname__)
        return fn(spark, sf_dir)

    return run


def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    out: dict[str, tuple] = {}
    for mod in _modules():
        for name, pair in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = (_hygienic(pair[0]), pair[1])
    front = {n: out[n] for n in _PRIORITY if n in out}
    rest = {n: p for n, p in out.items() if n not in front}
    return {**front, **rest}


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
