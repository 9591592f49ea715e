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

import decimal
import json
import math
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


def _page_rows(body: str) -> tuple[list[dict], str | None, int]:
    """ONE definition of the page-body contract, shared by
    read_paginated and rest_dead_pages (quarantine, never kill the
    batch — the r10-r12 fuzz-battery contract): returns
    (rows, page_reason, n_bad_rows). An empty/whitespace body is the
    legitimate past-the-end page ('empty' reason, no rows); a body that
    is not JSON quarantines as 'bad_json'; an OData error envelope (an
    object carrying 'error' but no 'value' list — the standard
    rate-limit/auth failure body) as 'error_body'; any other JSON that
    is not an OData page (an object whose 'value' is a list — r13
    advice catch: .get('value', []) defaulted to a list, so error
    bodies silently counted as healthy-and-empty pages) as
    'bad_envelope'; non-object entries inside 'value' are dropped and
    counted. A real HTTP transport returns HTML error pages, truncated
    JSON and rate-limit bodies — one such page must cost that page, not
    the whole export."""
    if not body or not body.strip():
        return [], "empty", 0
    try:
        payload = json.loads(body)
    except ValueError:
        return [], "bad_json", 0
    if not isinstance(payload, dict) or not isinstance(payload.get("value"), list):
        if isinstance(payload, dict) and "error" in payload and "value" not in payload:
            return [], "error_body", 0
        return [], "bad_envelope", 0
    value = payload["value"]
    rows = [r for r in value if isinstance(r, dict)]
    return rows, None, len(value) - len(rows)


_F64_MAX = 1.7976931348623157e308


def _dec_cell(x, precision: int, scale: int):
    """Decimal-field cell rule (review catch: funneling DecimalType
    through the float64 rule silently rounded exact integers beyond
    2^53 — the corruption class the integral branch guards against).
    Ints convert EXACTLY via decimal.Decimal; finite floats via their
    shortest repr, quantized to the declared scale (half-even, matching
    Arrow's float->decimal rounding the pre-object-dtype path applied);
    anything else — bools, non-finite floats, values whose integral
    digits exceed precision-scale — quarantines to null rather than
    raising out of the Arrow conversion."""
    if isinstance(x, bool):
        return None
    if isinstance(x, int):
        d = decimal.Decimal(x)
    elif isinstance(x, float) and math.isfinite(x):
        d = decimal.Decimal(str(x))
    else:
        return None
    try:
        with decimal.localcontext() as ctx:
            ctx.prec = max(precision, 38)
            d = d.quantize(
                decimal.Decimal(1).scaleb(-scale), rounding=decimal.ROUND_HALF_EVEN
            )
    except decimal.InvalidOperation:
        return None
    if abs(d) >= decimal.Decimal(10) ** (precision - scale):
        return None
    return d


def _dbl_cell(x):
    """Double-field cell rule: finite floats and +/-inf pass; a JSON
    NaN (the nonstandard literal json.loads accepts) QUARANTINES to
    null — not because NaN isn't a representable double, but because
    Arrow's pandas-null-sentinel handling collapses NaN to null in the
    mapInPandas conversion regardless of column dtype (verified both
    object and float64 paths), so 'passing it through' would just be an
    undocumented quarantine indistinguishable from this explicit one
    (r13 advice catch: the old docstring claimed NaN survived; it never
    did). Non-bool ints pass ONLY inside the float64 range — a JSON
    integer beyond it would raise OverflowError in the numeric
    conversion (review repro: a 400-digit int killed the whole export);
    everything else quarantines to null.

    math/decimal are module-level imports (r14 advice): these cell
    rules run once per cell of every REST page inside mapInPandas, and
    a per-call `import math` is a dict lookup + lock on that hot
    path."""
    if isinstance(x, bool):
        return None
    if isinstance(x, float):
        return None if math.isnan(x) else x
    if isinstance(x, int) and -_F64_MAX <= x <= _F64_MAX:
        return float(x)
    return None


def _coerce_to_schema(pdf, fields):
    """Snap a page frame to the declared Spark schema so one
    wrong-typed cell cannot kill the Arrow conversion (the mapInPandas
    twin of the ANSI try_cast fixes): numeric fields quarantine
    non-numeric scalars (and bools — JSON true in a double field is a
    schema violation, not a 1.0) to null; integral fields additionally
    require an exact in-range integer — built as Int64 DIRECTLY from
    the object cells, never through a float64 round trip (review
    repro: with one quarantined cell in the column, to_numeric went
    float64 and silently corrupted 2^53+1); string/boolean fields
    accept only their own type. Other field types (timestamps, nested)
    pass through untouched — pages that misuse those still fail loudly
    rather than guess."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    for f in fields:
        c = f.name
        if c not in pdf.columns:
            continue
        if isinstance(f.dataType, DecimalType):
            p, s = f.dataType.precision, f.dataType.scale
            pdf[c] = pdf[c].map(lambda x, _p=p, _s=s: _dec_cell(x, _p, _s))
        elif isinstance(f.dataType, (DoubleType, FloatType)):
            pdf[c] = pd.to_numeric(pdf[c].map(_dbl_cell), errors="coerce")
        elif isinstance(f.dataType, (LongType, IntegerType, ShortType, ByteType)):
            # plain list, not Series.map: map() itself infers float64
            # for ints-with-nulls and silently rounds 2^53+1 (repro)
            kept = [
                x
                if isinstance(x, int)
                and not isinstance(x, bool)
                and -(2**63) <= x < 2**63
                else None
                for x in pdf[c].tolist()
            ]
            pdf[c] = pd.array(kept, dtype="Int64")
        elif isinstance(f.dataType, StringType):
            pdf[c] = pdf[c].map(lambda x: x if isinstance(x, str) else None)
        elif isinstance(f.dataType, BooleanType):
            pdf[c] = pdf[c].map(lambda x: x if isinstance(x, bool) else None)
    return pdf


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
    duplicate timestamps and sorts after concat). Malformed pages/rows
    quarantine per the _page_rows contract (use rest_dead_pages for the
    accounting); wrong-typed cells null out per _coerce_to_schema."""
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

    struct = StructType.fromDDL(schema)
    schema_cols = struct.fieldNames()

    def fetch_pages(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, page_rows, _, _ in _iter_pages(
                pdf["page"], fetch, base_url, entity, select, filter_expr, orderby, page_size
            ):
                rows.extend(page_rows)
            # dtype=object: pandas' column inference would otherwise
            # eagerly convert, and one beyond-float64 JSON integer
            # raised OverflowError before coercion could quarantine it
            frame = (
                pd.DataFrame(rows, dtype=object).reindex(columns=schema_cols)
                if rows
                else pd.DataFrame(columns=schema_cols)
            )
            yield _coerce_to_schema(frame, struct.fields)

    raw = pages.mapInPandas(fetch_pages, schema=schema)
    return raw


def _iter_pages(
    page_ids,
    fetch: Callable[[str], str],
    base_url: str,
    entity: str,
    select: list[str] | None,
    filter_expr: str | None,
    orderby: str | None,
    page_size: int,
):
    """ONE definition of the per-page url-build/fetch/parse loop, shared
    by read_paginated and rest_dead_pages — the accounting twin is only
    valid if it fetches byte-identical URLs under the same contract
    (review finding: the two hand-rolled loops could drift). Yields
    (page, rows, reason, n_bad_rows) per _page_rows."""
    for page in page_ids:
        url = build_query(
            base_url, entity, select, filter_expr, orderby, page_size, int(page)
        )
        rows, reason, n_bad = _page_rows(fetch(url))
        yield int(page), rows, reason, n_bad


def rest_dead_pages(
    spark: SparkSession,
    fetch: Callable[[str], str],
    base_url: str,
    entity: str,
    n_pages: int,
    select: list[str] | None = None,
    filter_expr: str | None = None,
    orderby: str | None = None,
    page_size: int = 200,
) -> DataFrame:
    """Accounting twin of read_paginated (the TTN all_dead_letters
    shape): one row per page with its quarantine reason ('empty',
    'bad_json', 'bad_envelope', 'error_body', or null for a good page) and the count
    of non-object entries dropped from its 'value' list. Same injected
    transport, same _page_rows contract — so
    read_paginated rows + dead-page reasons account for every page."""
    pages = spark.range(n_pages).withColumnRenamed("id", "page")

    def audit(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = [
                (page, reason, len(rows), n_bad)
                for page, rows, reason, n_bad in _iter_pages(
                    pdf["page"], fetch, base_url, entity, select, filter_expr, orderby, page_size
                )
            ]
            yield pd.DataFrame(
                out, columns=["page", "reason", "n_rows", "n_bad_rows"]
            )

    return pages.mapInPandas(
        audit, schema="page long, reason string, n_rows long, n_bad_rows long"
    )


def observations_frame(
    raw: DataFrame, ts_col: str = "phenomenonTime", key_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Post-processing the reference applies to every observation pull:
    parse timestamps, drop duplicate-timestamp rows, order by time
    (SamenMetenThings.py:1449-1474).

    The reference dedups WITHIN one datastream's series; a multi-station
    pull must pass the series key (e.g. key_cols=("station",)) or two
    stations reporting at the same phenomenonTime would collapse to one
    arbitrary row.

    try_to_timestamp, not to_timestamp: under ANSI mode one malformed
    phenomenonTime string would kill the whole export (the r12 TTN
    battery's exact failure class); a row whose timestamp cannot parse
    (or is absent) is quarantined — an observation without a valid
    phenomenon time has no place on a time axis."""
    return (
        raw.withColumn("ts", F.try_to_timestamp(F.col(ts_col)))
        .where(F.col("ts").isNotNull())
        .dropDuplicates([*key_cols, "ts"])
        .orderBy("ts")
    )
