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
# kept to exactly 50. Round-6 layout: (a) the rows new or changed this
# round — static_value_monitor + dead_kit_tiers (new graded twins of the
# stateful streaming operators), hybrid_search_rrf (new: BM25 (+) kNN
# reciprocal-rank fusion), quality_centroid_score (new: seed-centroid
# quality classifier), gopher_filter / text_stats / quality_score
# (nullif zero-word guards in both engines), bm25_search (corpus totals
# now a broadcast dimension instead of a driver collect);
# Late-round-6 additions to (a): a review pass changed five more graded
# queries — joost_correction (the _hourly_pivot rh series was fabricated
# by a least()-outside-the-guard slip, mirrored in the oracle so the
# hash could not catch it; rh is now honestly sparse and the query
# corrects each pollutant independently), pm_mass_fill (oracle's
# n_filled now counts NULL raw values like the Spark side and the fill
# itself), unpivot_long (pivot avg now the proven exact_avg/sql_avg
# pair instead of a hand-inlined native round), station_calibration +
# ols_summary (sqrt/division guards for collinear series in the shared
# expression text).
# crawl_rate_anomalies (new in late r6: batch twin of the streaming
# crawl-rate monitor — path-dependent EMA graded via a DuckDB RECURSIVE
# CTE oracle) also sits in (a).
# Layout: (a) 16 new/changed rows (the 12 leading entries plus
# gopher_filter / text_stats / quality_score / bm25_search further
# down); (b) the 11 rows whose last driver evidence is round 3 (rolled
# here from the r5 window, exactly as planned); (c) 23 of the 44 rows
# whose last evidence is round 4, registry order (pm_mass_fill,
# ols_summary, temperature_mix and tokenizer_fertility — also r4 — sit
# in (a) as changed rows). The remaining 17 r4-evidence rows
# (blob_metadata, frame_sample, hash_sample, corpus_build, stratified_sample,
# approx_distinct_users, range_validate, tristate_validity,
# zscore_outliers, grubbs_outliers, linear_regression, sigma_band,
# region_revenue, cascade_rollup, asof_align, mode_per_user, coverage,
# dedup_upsert) roll to round 7.
_PRIORITY = (
    # (a) new / fixed / changed in round 6
    "static_value_monitor",
    "dead_kit_tiers",
    "hybrid_search_rrf",
    "quality_centroid_score",
    "joost_correction",
    "pm_mass_fill",
    "unpivot_long",
    "station_calibration",
    "ols_summary",
    "temperature_mix",
    "tokenizer_fertility",
    "crawl_rate_anomalies",
    "gopher_filter",
    "text_stats",
    "quality_score",
    "bm25_search",
    # (b) last driver evidence: round 3
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
    # (c) last driver evidence: round 4 (first 23 in registry order)
    "ttn_decode",
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
    "knn_bruteforce",
    "embedding_dim_stats",
    "ann_ivf",
    "cluster_stats",
    "kmeans_train",
    "duplicate_spans",
    "pii_scrub",
    "tfidf_top_terms",
    "lang_id",
    "doc_fingerprint",
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
