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
# kept to exactly 50. Round-11 layout:
# (a) 4 NEW queries — ann_ivf_refined (two-stage IVF: wide SQ-code
# probe pooling candidates, exact re-rank through the fenced
# knn_rerank — both stages DuckDB-mirrored), ann_pq (product
# quantization per Jegou et al. 2011: per-subspace integer-grid
# codebooks, 12-byte codes, ADC search — whole chain DuckDB-mirrored;
# measured recall 1.00 after exact re-rank of the ADC top-200 at a
# 4.9% scan), dsir_weights (DSIR
# hashed-bigram importance resampling per Xie et al. 2023 — broadcast
# log-ratio table, exact_sum per-doc accumulation), and
# media_codec_matrix
# (the BMP24 + lossless-JPEG round trips, G.711
# mu/A-law decode, and MS- + IMA-ADPCM decode kernels under mapInPandas,
# oracle-pinned through the shared md5 synthesis: the BMP leg by
# losslessness, the G.711 legs by an arithmetic expansion validated
# exact against the tables for all 256 codes, the ADPCM leg by a
# two-step SQL unroll of the predictor recurrence — which also
# driver-grades the r11 truncate-toward-zero advice fix);
# (b) the 21 rows whose last driver evidence is round 8 — rolled here
# exactly as planned in the r10 comment;
# (c) 25 of the 48 rows whose last evidence is round 9, alphabetical.
# The remaining 23 r9-evidence rows (gap_detection, grubbs_outliers,
# hash_sample, hourly_gapfill,
# interval_inference, joost_correction, lang_id, latest_per_user,
# linear_regression, lki_index, media_embed, moving_average,
# ols_summary, pii_scrub, pm_mass_fill, quality_score, static_runs,
# static_value_monitor, temperature_mix, timeslice_avg,
# tokenizer_fertility, unpivot_long, wide_view) roll to round 12,
# after any r12-changed rows. After this window no registry row's
# driver evidence is older than round 9.
_PRIORITY = (
    # (a) new in round 11
    "media_codec_matrix",
    "ann_ivf_refined",
    "ann_pq",
    "dsir_weights",
    # (b) last driver evidence: round 8 (the planned 21)
    "part_supplier_stats",
    "percentile_summary",
    "pricing_summary",
    "props_json_stats",
    "quality_centroid_score",
    "region_rollup",
    "revenue_quartiles",
    "semdedup",
    "semdedup_auto",
    "sensor_set_diff",
    "sensorthings_pull",
    "simhash_pairs",
    "spatial_pairs",
    "sql_interface",
    "station_calibration",
    "taylor_calibration",
    "text_stats",
    "top_revenue_orders",
    "ttn_decode",
    "unit_conversion",
    "winnow_fingerprints",
    # (c) last driver evidence: round 9 (first 25, alphabetical)
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
    "crawl_rate_anomalies",
    "cross_split_leakage",
    "daily_qc_report",
    "dead_kit_tiers",
    "dead_kits",
    "decontam_report",
    "dedup_upsert",
    "distinct_active_kits",
    "doc_fingerprint",
    "dup_ngram_frac",
    "duplicate_spans",
    "embedding_outliers",
    "failing_sensor_report",
    "fit_apply",
    "frame_sample",
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
