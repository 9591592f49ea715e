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


# Queries hoisted to the very front of the registry: new or changed this
# round, so they must land inside the driver's 50-row correctness-gate
# window. Round-3 layout: (a) the three round-2 hash-mismatch rows, now
# fixed (DuckDB HUGEINT sums cast to BIGINT); (b) queries new this round;
# (c) the 34 queries round 2 rotated out (they were green in round 1 but
# code has moved since — re-confirm them). Everything round 2 just proved
# green rotates to the back.
_PRIORITY = (
    # (a) fixed round-2 reds + r2-green queries whose code changed
    # materially in round 3 (IEEE rounding, the ranged-persist fix) —
    # changed code needs fresh driver evidence more than unchanged
    # stale rows do
    "repetition_stats",
    "token_count",
    "sequence_packing",
    "station_calibration",
    "revenue_quartiles",
    "fit_apply",
    # (b) new in round 3
    "dup_ngram_frac",
    "perplexity_bucket",
    "tokenizer_fertility",
    "chunk_overlap",
    "url_filter",
    "incremental_dedup",
    "ann_recall",
    "vocab_stats",
    "media_embed",
    "modality_mix",
    "cascade_rollup",
    "bm25_search",
    "spatial_pairs",
    "weighted_sample",
    # (c) r1-only rows, oldest evidence first
    "joost_correction",
    "dew_point",
    "unit_conversion",
    "taylor_calibration",
    "pricing_summary",
    "region_rollup",
    "sql_interface",
    "top_revenue_orders",
    "region_revenue",
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
    "asof_align",
    "mode_per_user",
    "coverage",
    "dedup_upsert",
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
