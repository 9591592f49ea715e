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

    Hourly AVG/STDDEV per field — the canonical MySense aggregation
    (grubbs.py:1137-1143 timeslice GROUP BY) on the events stream table.
    """
    from mysense_spark.operators.timeseries import q_hourly_stats

    return q_hourly_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mysense_spark.queries import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from mysense_spark.queries import oracle_sqls

    return oracle_sqls()
