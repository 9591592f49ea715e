"""K4/K8: CSV/XLSX exports.

CSV is `df.write.csv` with the reference's header/rounding conventions
(statistics/MySQL2CSV.sh, SamenMetenTools/Things2CSV.py:81-371). XLSX
(K7, Things2XLSX.py) writes through the stdlib zip+XML codec
(sources/xlsx.py) — a real artifact with no xlsxwriter dependency; the
summary QUERY that feeds it (per-sensor min/avg/max) is engine-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Write `path/` as a CSV directory (Spark layout: part files +
    _SUCCESS). single_file=True funnels to ONE part file via
    repartition(1): it pays one exchange of the (small, report-sized)
    result, but the plan upstream of the exchange keeps its parallelism.
    coalesce(1) was used here before — it avoids the shuffle, but the
    1-partition hint propagates DOWN through narrow stages and collapses
    the whole upstream computation to a single task, a silent
    perf cliff whenever the exported frame has a heavy plan behind it."""
    out = df.repartition(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def sensor_summary(fact: DataFrame) -> DataFrame:
    """The K7/K8 report query: per (kit, field) count/min/avg/max over
    valid measurements (Things2XLSX conditional-format columns)."""
    return (
        fact.where(F.col("valid").eqNullSafe(F.lit(True)))
        .groupBy("kit_id", "field")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.avg("value"), 2).alias("avg_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )


def export_xlsx(summary_rows: list[dict], path: str) -> bool:
    """Write the summary as a real XLSX — the stdlib zip+XML writer
    (sources/xlsx.py), no xlsxwriter needed; the import gate this used
    to hide behind is gone. Returns True (kept bool for API compat) —
    driver-level artifact, not engine work."""
    from ..sources.xlsx import write_xlsx

    write_xlsx(summary_rows, path)
    return True


# a report is kits × fields rows; anything bigger is data masquerading
# as a report and must not be collected into one workbook
_MAX_REPORT_ROWS = 100_000


def export_region_xlsx(
    summary: DataFrame, path: str, region_col: str = "region"
) -> list[str]:
    """K7's actual artifact shape: ONE WORKSHEET PER REGION
    (SamenMetenTools/Things2XLSX.py writes a sheet per municipality),
    written through the stdlib multi-sheet codec
    (sources/xlsx.py:write_xlsx_sheets). Sheets are ordered by region
    name; each sheet's rows are ordered by the remaining columns so the
    artifact is byte-deterministic. Returns the sheet names AS WRITTEN:
    raw region values pass through the codec's Excel-rules sanitizer
    (31-char cap, []:*?/\\ -> _, case-insensitive dedup), so a region
    named e.g. "A/B" comes back "A_B".

    The collect here is a bounded REPORT materialization, not the sink
    hot path: a summary is kits × fields rows, and the _MAX_REPORT_ROWS
    fence (limit() BEFORE the collect) fails loudly if someone points
    this at a fact table."""
    cols = [c for c in summary.columns if c != region_col]
    rows = (
        summary.orderBy(region_col, *cols)
        .limit(_MAX_REPORT_ROWS + 1)
        .collect()
    )
    if len(rows) > _MAX_REPORT_ROWS:
        raise ValueError(
            f"export_region_xlsx: summary exceeds {_MAX_REPORT_ROWS} rows — "
            f"this is a report writer, not a data sink; aggregate first"
        )
    sheets: dict[str, list[dict]] = {}
    for r in rows:
        d = r.asDict()
        region = str(d.pop(region_col))
        sheets.setdefault(region, []).append(d)
    if not sheets:
        raise ValueError("export_region_xlsx: empty summary — nothing to write")
    from ..sources.xlsx import write_xlsx_sheets

    return write_xlsx_sheets(sheets, path)
