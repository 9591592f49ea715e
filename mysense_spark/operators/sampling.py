"""Deterministic sampling / split assignment and sketch-based distinct
counts — training-data-pipeline operators (driver north star; the
reference has no sampling, it processes every datagram).

Scale design (100 TB):
- Hash-based splits are THE way to sample at scale: no global sort, no
  state, reproducible on any cluster size, stable under re-runs and
  late-arriving data (a doc's split never changes). The md5-derived
  bucket matches the DuckDB oracle bit-for-bit.
- approx_count_distinct is HyperLogLog++: constant memory per group vs
  a full shuffle+dedup for exact distinct — the only viable cardinality
  count over billions of keys. Sketch internals are engine-specific, so
  this query is gated rows-only (no SQL oracle), with the exact count
  alongside to show the error is within the configured rsd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from .util import exact_avg, sql_avg

_TRAIN_PCT = 80
_VAL_PCT = 90  # train < 80 <= val < 90 <= test


def _bucket(c) -> F.Column:
    """Deterministic bucket 0..99 from md5 of the key — identical on any
    engine, any partitioning, any run."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 100


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified train/val/test split of the document corpus by
    deterministic content-key hash, reported per (lang, split): counts
    and average document length prove the split is unbiased."""
    doc = load(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < _TRAIN_PCT, "train").when(b < _VAL_PCT, "val").otherwise("test")
    )
    return (
        doc.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            exact_avg(F.col("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang", "split")
    )


SQL_HASH_SAMPLE = f"""
WITH b AS (
  SELECT lang, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < {_TRAIN_PCT} THEN 'train'
            WHEN bucket < {_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       {sql_avg('n_chars', 4)} AS avg_chars
FROM b
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct kits per event type next to the exact
    count (A10-style activity accounting at sketch cost). No SQL oracle:
    HLL estimates are engine-specific; the exact/approx columns make the
    error auditable instead."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .withColumn(
            "rel_error",
            F.round(F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users"), 4),
        )
        .orderBy("event_type")
    )


QUERIES: dict[str, tuple] = {
    "hash_sample": (q_hash_sample, SQL_HASH_SAMPLE),
    "approx_distinct_users": (q_approx_distinct_users, None),
}
