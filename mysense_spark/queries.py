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
# kept to exactly 50. Round-12 layout:
# (a) 5 NEW or CHANGED queries — ann_ivfadc (NEW: the Jegou-2011
# production composition: trained-PQ codes ADC-scanned ONLY inside the
# query's probed IVF cells, per-query shortlist exact-re-ranked through
# the fenced knn_rerank; whole chain DuckDB-mirrored via a shared PQ
# CTE block), dsir_resample (NEW: the DSIR paper's actual output — a
# deterministic Gumbel top-k importance resample over the dsir_weights
# lineage), media_codec_matrix (CHANGED: grew to 8 families — 6/7 are
# DC-only BASELINE and PROGRESSIVE lossy JPEG through the real
# encode/decode kernels; flat 8x8 blocks survive DCT + unit
# quantization exactly, so the md5 mirror stays codec-free), ann_pq
# (CHANGED lineage: both PQ encode passes now run a cogrouped numpy
# int64 block argmin — bit-identical, ~10x at sf1.0), and
# ann_ivf_refined (CHANGED: routing stage extracted into _route, shared
# with ann_ivfadc — pure code motion, same plan);
# (late r12) two more NEW queries — c4_filter (the Raffel-2020 C4
# cleaning heuristics: terminal-punctuation line retention, >=3-word
# lines, javascript-line drop, >=5-sentence / lorem-ipsum / curly-brace
# page rules) and hard_negatives (contrastive-training hard-negative
# mining: top-3 cross-label cosine per query) — displacing the last two
# (c) rows (kit_throttle, kmeans_train) into the r13 roll;
# (later r12) ann_srp (NEW: Charikar sign-random-projection LSH ANN —
# md5-derived integer hyperplanes, multi-table bucketed candidates,
# Lv-2007 multi-probe expansion, fenced exact re-rank; whole chain
# DuckDB-mirrored) and media_decode_stats (CHANGED lineage: the tiny
# doc_id projection now fans out to every core via _spread before the
# per-doc codec mapInPandas — same rows, 2x at sf1.0) — displacing the
# last two remaining (c) rows (hybrid_search_rrf, incremental_dedup)
# into the r13 roll;
# (later r12 still) ann_ivfpq (NEW: by-RESIDUAL IVFPQ, the faiss
# by_residual=True default — residual-trained codebook, per-(query,
# cell) ADC LUTs, cell-pruned scan, fenced exact re-rank; whole chain
# DuckDB-mirrored; beats raw-vector codes on clustered corpora,
# measured both ways in SCALING.md) — displacing hourly_stats into the
# r13 roll;
# and media_structure (NEW: the STRUCTURAL parse tier driver-graded —
# real write_png/write_jpeg geometry, hand-packed ISO-BMFF moov trees
# incl. the audio-only .m4a modality branch, PCM WAV duration; md5
# synthesis makes the oracle parser-free) — displacing gopher_filter
# into the r13 roll;
# (b) the 23 rows whose last driver evidence is round 9 — rolled here
# exactly as planned in the r11 comment;
# (c) 16 of the 50 rows whose last evidence is round 10, alphabetical.
# The remaining 33 r10-evidence rows (gopher_filter, hourly_stats, hybrid_search_rrf,
# incremental_dedup, kit_throttle, kmeans_train, knn_bruteforce,
# maintenance_window_join, minhash_lsh_pairs,
# minmax_normalize, modality_mix, mode_per_user, multilinear_regression,
# neardup_clusters, neighbour_search, ngram_jaccard_pairs,
# order_priority_counts, perplexity_bucket, range_validate,
# region_revenue, repetition_stats, semdedup_trained, sequence_packing,
# sigma_band, source_overlap, stratified_sample, tfidf_top_terms,
# token_count, tristate_validity, url_filter, vocab_stats,
# weighted_sample, zscore_outliers) roll to round 13, after any
# r13-changed rows. After this window no registry row's driver evidence
# is older than round 10.
_PRIORITY = (
    # (a) new/changed in round 12
    "ann_ivfpq",
    "media_structure",
    "ann_srp",
    "media_decode_stats",
    "ann_ivfadc",
    "dsir_resample",
    "c4_filter",
    "hard_negatives",
    "media_codec_matrix",
    "ann_pq",
    "ann_ivf_refined",
    # (b) last driver evidence: round 9 (the planned 23)
    "gap_detection",
    "grubbs_outliers",
    "hash_sample",
    "hourly_gapfill",
    "interval_inference",
    "joost_correction",
    "lang_id",
    "latest_per_user",
    "linear_regression",
    "lki_index",
    "media_embed",
    "moving_average",
    "ols_summary",
    "pii_scrub",
    "pm_mass_fill",
    "quality_score",
    "static_runs",
    "static_value_monitor",
    "temperature_mix",
    "timeslice_avg",
    "tokenizer_fertility",
    "unpivot_long",
    "wide_view",
    # (c) last driver evidence: round 10 (first 16, alphabetical)
    "alarm_suppression",
    "ann_ivf",
    "ann_ivf_trained",
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
