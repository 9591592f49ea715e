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
# kept to exactly 50. Round-5 layout: (a) the rows changed this round —
# station_calibration (sql_ieee_round now CAST-pinned to DOUBLE, closing
# the r3/r4 DecimalType hash red), ngram_jaccard_pairs (new hot-shingle
# df cap, mirrored in its oracle), decontam_report (its oracle text rides
# the sql_ieee_round change); (b) the 8 rows whose last driver evidence
# is round 2 (rolled here from the full r4 window, exactly as planned);
# (c) 33 of the 44 rows whose last evidence is round 3, registry order.
# The remaining 11 r3-evidence rows (failing_sensor_report,
# distinct_active_kits, wide_view, timeslice_avg, latest_per_user,
# static_runs, gap_detection, interval_inference, dead_kits,
# hourly_gapfill, moving_average) roll to round 6 — after this round no
# row's evidence is older than r3.
_PRIORITY = (
    # (a) new / fixed / changed in round 5
    "gopher_filter",
    "semdedup",
    "cross_split_leakage",
    "embedding_outliers",
    "source_overlap",
    "winnow_fingerprints",
    "station_calibration",
    "ngram_jaccard_pairs",
    "decontam_report",
    # (b) last driver evidence: round 2
    "multilinear_regression",
    "minmax_normalize",
    "daily_qc_report",
    "aqi_index",
    "lki_index",
    "aqhi_index",
    "caqi_index",
    "sensor_set_diff",
    # (c) last driver evidence: round 3
    "ann_recall",
    "vocab_stats",
    "dup_ngram_frac",
    "perplexity_bucket",
    "tokenizer_fertility",
    "repetition_stats",
    "token_count",
    "media_embed",
    "modality_mix",
    "chunk_overlap",
    "weighted_sample",
    "url_filter",
    "sequence_packing",
    "fit_apply",
    "joost_correction",
    "dew_point",
    "unit_conversion",
    "taylor_calibration",
    "pricing_summary",
    "region_rollup",
    "revenue_quartiles",
    "sql_interface",
    "top_revenue_orders",
    "part_supplier_stats",
    "customers_without_orders",
    "order_priority_counts",
    "hourly_stats",
    "event_sessions",
    "maintenance_window_join",
    "props_json_stats",
    "unpivot_long",
    "chatty_kits",
    "percentile_summary",
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
