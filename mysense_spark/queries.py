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
# kept to exactly 50. Round-7 layout:
# (a) 7 rows new or changed this round — kit_throttle +
# alarm_suppression (new graded batch twins of the last two oracle-less
# stateful semantics: IsBehavingKit per-device throttle and the 6 h
# per-(kit,event) alarm suppression, both via recursive-CTE oracles),
# semdedup_auto (new: corpus-proportional-K SemDeDup, the α-flattening
# variant), tfidf_top_terms + perplexity_bucket (eager driver-side
# scalars retired for broadcast-totals crossJoins — now fully lazy),
# semdedup + ann_ivf (refactored onto the shared semdedup_pairs /
# ann_ivf_search engines; outputs unchanged, freshness re-proved);
# (b) the 18 rows whose last driver evidence is round 4, rolled here
# exactly as planned in the r6 comment;
# (c) 25 of the 43 rows whose last evidence is round 5, registry order.
# The remaining 18 r5-evidence rows (dew_point, unit_conversion,
# taylor_calibration, pricing_summary, region_rollup, revenue_quartiles,
# sql_interface, top_revenue_orders, part_supplier_stats,
# customers_without_orders, order_priority_counts, hourly_stats,
# event_sessions, maintenance_window_join, props_json_stats,
# chatty_kits, percentile_summary, sensor_set_diff) roll to round 8.
_PRIORITY = (
    # (a) new / changed in round 7
    "kit_throttle",
    "alarm_suppression",
    "semdedup_auto",
    "tfidf_top_terms",
    "perplexity_bucket",
    "semdedup",
    "ann_ivf",
    # (b) last driver evidence: round 4 (the planned 18)
    "blob_metadata",
    "frame_sample",
    "hash_sample",
    "corpus_build",
    "stratified_sample",
    "approx_distinct_users",
    "range_validate",
    "tristate_validity",
    "zscore_outliers",
    "grubbs_outliers",
    "linear_regression",
    "sigma_band",
    "region_revenue",
    "cascade_rollup",
    "asof_align",
    "mode_per_user",
    "coverage",
    "dedup_upsert",
    # (c) last driver evidence: round 5 (first 25 in registry order)
    "ngram_jaccard_pairs",
    "cross_split_leakage",
    "source_overlap",
    "decontam_report",
    "embedding_outliers",
    "ann_recall",
    "winnow_fingerprints",
    "vocab_stats",
    "dup_ngram_frac",
    "repetition_stats",
    "token_count",
    "media_embed",
    "modality_mix",
    "chunk_overlap",
    "weighted_sample",
    "url_filter",
    "sequence_packing",
    "multilinear_regression",
    "minmax_normalize",
    "fit_apply",
    "daily_qc_report",
    "aqi_index",
    "lki_index",
    "aqhi_index",
    "caqi_index",
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
