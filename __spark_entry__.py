"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check on sf0.001.
queries()      — one entry per implemented operator from SURVEY.md §2,
                 each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent ANSI SQL per query (correctness gate).

Implementations live in mysense_spark/operators/*; each module colocates
the Spark implementation with its oracle SQL (see mysense_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The integrated daily QC report: hourly pivot (A2/J3) -> range
    validation (P2) -> AQI breakpoint interpolation (§2.9) -> daily
    per-kit rollup with quality class — the full operator chain a
    MySense operator reads every morning, in one Spark plan.
    """
    from mysense_spark.operators.indices import q_daily_qc_report

    return q_daily_qc_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mysense_spark.queries import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from mysense_spark.queries import oracle_sqls

    return oracle_sqls()
