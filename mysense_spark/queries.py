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
# kept to exactly 50. Round-10 layout:
# (a) 1 NEW query — media_decode_stats (the real PNG/WAV encode->decode
# kernels under mapInPandas, oracle-pinned through a shared md5
# synthesis) — and the 2 rows whose code changed this round —
# semdedup_trained + ann_ivf_trained (the trained-codebook assignment
# gained tiered physical plans: single-cell route elision, the fused
# broadcast form, and a salted shuffle-routed equi-join above the
# _TC_BCAST_K1 broadcast ceiling, so no O(K1) broadcast survives at
# any N);
# (b) the 20 rows whose last driver evidence is round 7 — rolled here
# exactly as planned in the r9 comment;
# (c) 27 of the 48 rows whose last evidence is round 8, alphabetical.
# The remaining 21 r8-evidence rows (part_supplier_stats,
# percentile_summary,
# pricing_summary, props_json_stats, quality_centroid_score,
# region_rollup, revenue_quartiles, semdedup, semdedup_auto,
# sensor_set_diff, sensorthings_pull, simhash_pairs, spatial_pairs,
# sql_interface, station_calibration, taylor_calibration, text_stats,
# top_revenue_orders, ttn_decode, unit_conversion, winnow_fingerprints)
# roll to round 11, after any r11-changed rows. After this window no
# registry row's driver evidence is older than round 8.
_PRIORITY = (
    # (a) new in round 10, then code changed in round 10
    "media_decode_stats",
    "semdedup_trained",
    "ann_ivf_trained",
    # (b) last driver evidence: round 7 (the planned 20)
    "minmax_normalize",
    "modality_mix",
    "mode_per_user",
    "multilinear_regression",
    "ngram_jaccard_pairs",
    "perplexity_bucket",
    "range_validate",
    "region_revenue",
    "repetition_stats",
    "sequence_packing",
    "sigma_band",
    "source_overlap",
    "stratified_sample",
    "tfidf_top_terms",
    "token_count",
    "tristate_validity",
    "url_filter",
    "vocab_stats",
    "weighted_sample",
    "zscore_outliers",
    # (c) last driver evidence: round 8 (first 27, alphabetical)
    "alarm_suppression",
    "ann_ivf",
    "ann_recall",
    "bm25_search",
    "chatty_kits",
    "cluster_stats",
    "csv_ingest",
    "customers_without_orders",
    "dedup_exact",
    "dedup_keep_best",
    "dew_point",
    "embedding_dim_stats",
    "embedding_neardup",
    "event_sessions",
    "geofence_transitions",
    "gopher_filter",
    "hourly_stats",
    "hybrid_search_rrf",
    "incremental_dedup",
    "kit_throttle",
    "kmeans_train",
    "knn_bruteforce",
    "maintenance_window_join",
    "minhash_lsh_pairs",
    "neardup_clusters",
    "neighbour_search",
    "order_priority_counts",
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
