"""S7: SensorThings-style paginated REST reader as a distributed batch
source (SamenMetenTools/SamenMetenThings.py:1409-1474: OData $filter/
$select/$orderby query builder + @iot.nextLink pagination loop).

Design: page fetches are partitioned over executors with mapInPandas —
`spark.range(n_pages)` drives one HTTP GET per row, so a 10k-station
export parallelizes instead of the reference's 4-thread worker pool
(MyWorkers, SamenMetenThings.py:261-487). The HTTP transport is an
injected callable (this container has no network; tests inject a fake).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_query(
    base_url: str,
    entity: str,
    select: list[str] | None = None,
    filter_expr: str | None = None,
    orderby: str | None = None,
    page_size: int = 200,
    page: int = 0,
) -> str:
    """OData-ish query builder (the reference builds these strings by
    hand per call site)."""
    params = [f"$top={page_size}", f"$skip={page * page_size}", "$count=true"]
    if select:
        params.append("$select=" + ",".join(select))
    if filter_expr:
        params.append("$filter=" + filter_expr)
    if orderby:
        params.append("$orderby=" + orderby)
    return f"{base_url}/{entity}?" + "&".join(params)


def read_paginated(
    spark: SparkSession,
    fetch: Callable[[str], str],
    base_url: str,
    entity: str,
    n_pages: int,
    schema: str,
    select: list[str] | None = None,
    filter_expr: str | None = None,
    orderby: str | None = None,
    page_size: int = 200,
) -> DataFrame:
    """Distributed paginated fetch: one task per page, rows json-decoded
    into `schema`. Dedup/sort left to the caller (the reference drops
    duplicate timestamps and sorts after concat)."""
    pages = spark.range(n_pages).withColumnRenamed("id", "page")
    # OData/SensorThings responses omit null-valued fields and may add
    # extras; mapInPandas requires the frame's columns to EQUAL the
    # declared schema, so reindex every page to it (missing -> null,
    # extras dropped) instead of letting one sparse page kill the job
    # parse the DDL properly — a naive comma split breaks on any
    # parameterized/nested type (decimal(10,2), map<string,string>,
    # struct<...>) and the reindex would then silently null out real
    # columns
    from pyspark.sql.types import StructType

    schema_cols = StructType.fromDDL(schema).fieldNames()

    def fetch_pages(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for page in pdf["page"]:
                url = build_query(base_url, entity, select, filter_expr, orderby, page_size, int(page))
                body = fetch(url)
                if not body:
                    continue
                payload = json.loads(body)
                rows.extend(payload.get("value", []))
            yield pd.DataFrame(rows).reindex(columns=schema_cols) if rows else pd.DataFrame(
                columns=schema_cols
            )

    raw = pages.mapInPandas(fetch_pages, schema=schema)
    return raw


def observations_frame(
    raw: DataFrame, ts_col: str = "phenomenonTime", key_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Post-processing the reference applies to every observation pull:
    parse timestamps, drop duplicate-timestamp rows, order by time
    (SamenMetenThings.py:1449-1474).

    The reference dedups WITHIN one datastream's series; a multi-station
    pull must pass the series key (e.g. key_cols=("station",)) or two
    stations reporting at the same phenomenonTime would collapse to one
    arbitrary row."""
    return (
        raw.withColumn("ts", F.to_timestamp(ts_col))
        .dropDuplicates([*key_cols, "ts"])
        .orderBy("ts")
    )
