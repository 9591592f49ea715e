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

    mods = [relational, timeseries]
    for name in ("qc", "indices", "regression", "geo", "text", "dedup", "similarity", "multimodal", "ingest", "sampling"):
        try:
            mod = __import__(f"mysense_spark.operators.{name}", fromlist=[name])
            mods.append(mod)
        except ImportError:
            pass
    return mods


def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    out: dict[str, tuple] = {}
    for mod in _modules():
        for name, pair in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = pair
    return out


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
