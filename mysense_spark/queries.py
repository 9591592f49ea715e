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
# kept to exactly 50. Round-8 layout:
# (a) 10 rows new or changed this round — semdedup_trained +
# ann_ivf_trained (NEW: the trained two-level codebook — md5-sampled
# fine seeds, Lloyd-refined coarse+fine levels, coarse-cell-PRUNED
# assignment join — graded with full DuckDB mirrors of the training and
# both pruned passes); semdedup / semdedup_auto / ann_ivf / ann_recall
# (the engine default is now the trained codebook, fixture codebooks
# passed explicitly — outputs unchanged, freshness re-proved);
# bm25_search + winnow_fingerprints (engines refactored onto injectable
# corpora for the new formula pins); kit_throttle + alarm_suppression
# (partition scans rewritten group-contiguous over sorted Arrow batches
# — task memory now one batch, not the partition);
# (b) the 18 rows whose last driver evidence is round 5, rolled here
# exactly as planned in the r7 comment;
# (c) 22 of the 48 rows whose last evidence is round 6, registry order.
# The remaining 26 r6-evidence rows (duplicate_spans, tokenizer_fertility,
# pii_scrub, lang_id, quality_score, doc_fingerprint, temperature_mix,
# pm_mass_fill, ols_summary, joost_correction, unpivot_long,
# failing_sensor_report, distinct_active_kits, wide_view, timeslice_avg,
# latest_per_user, static_runs, gap_detection, interval_inference,
# dead_kits, hourly_gapfill, moving_average, static_value_monitor,
# dead_kit_tiers, crawl_rate_anomalies, ...) roll to round 9, oldest
# first, after any r9-changed rows.
_PRIORITY = (
    # (a) new / changed in round 8
    "semdedup_trained",
    "ann_ivf_trained",
    "kit_throttle",
    "alarm_suppression",
    "bm25_search",
    "winnow_fingerprints",
    "semdedup",
    "semdedup_auto",
    "ann_ivf",
    "ann_recall",
    # (b) last driver evidence: round 5 (the planned 18)
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
    "chatty_kits",
    "percentile_summary",
    "sensor_set_diff",
    # (c) last driver evidence: round 6 (first 22 in registry order)
    "ttn_decode",
    "station_calibration",
    "sensorthings_pull",
    "csv_ingest",
    "neighbour_search",
    "geofence_transitions",
    "spatial_pairs",
    "dedup_exact",
    "incremental_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_neardup",
    "neardup_clusters",
    "dedup_keep_best",
    "hybrid_search_rrf",
    "quality_centroid_score",
    "knn_bruteforce",
    "embedding_dim_stats",
    "cluster_stats",
    "kmeans_train",
    "gopher_filter",
    "text_stats",
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
