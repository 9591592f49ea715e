"""Bucketed materialization: the co-located-join strategy for repeated
fact-to-fact joins at scale.

Broadcast covers dimension joins; AQE covers skew — but a fact-to-fact
join (measurements x per-kit QC state, events x per-user profiles,
doc-shingles x doc-shingles) shuffles BOTH sides on every run. When the
same join key is hit repeatedly, the 100 TB answer is to pay the shuffle
once at write time: bucket both tables by the key into the same bucket
count, and every subsequent join is bucket-to-bucket with NO exchange on
either side (Spark's bucketing-aware scan hands each task matching
bucket files directly).

The reference has no analog — MySQL gives it per-kit physical tables,
which is the same idea done as DDL sprawl (SURVEY §1.1); bucketing keeps
one logical table and makes the co-location a storage property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize df as a parquet table bucketed (and optionally
    sorted) by `keys`. `buckets` should match across every table that
    will join on `keys` — equal bucket counts are what let Spark elide
    the exchange. sort_cols additionally pre-sorts within buckets so a
    sort-merge join skips its sort phase."""
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys. The
    resulting plan must contain no Exchange — test_plan_contracts pins
    that property."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)
