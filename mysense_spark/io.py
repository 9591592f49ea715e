"""Loaders for the driver's synthetic parquet star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings. All reads are plain `spark.read.parquet` so Catalyst
gets full pushdown/pruning; no caching here — callers decide.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# columns stored as TIMESTAMP(NANOS) in the driver parquet; Spark reads them
# as long (spark.sql.legacy.parquet.nanosAsLong) and we convert to micros
# with truncation — identical to DuckDB's ns->us cast.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # The driver may hand us a vanilla session: pin the runtime-settable
    # confs our semantics depend on (tz-stable bucketing, nanos parquet).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in _NANO_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` works 1:1 with
    the DuckDB oracle (which pre-registers the same names)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
