"""S8: CSV / XLSX measurement-file input — the reference accepts operator
-supplied spreadsheets and CSV dumps of kit series (MyDatacollector's
CSV input mode and SamenMetenTools' spreadsheet round-trip;
statistics/MySQL2CSV.sh is the export twin).

- CSV: schema-pinned distributed `spark.read.csv` — the scale path; a
  directory of per-kit CSV dumps reads as one partitioned scan with
  filter pushdown (csv supports predicate pruning on partitions).
- XLSX: operator config sheets are small, driver-parsed via openpyxl
  (gated behind import — the lib is absent in this container) and then
  parallelized with createDataFrame; honest about being the small-file
  path, never the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MEASUREMENT_SCHEMA = (
    "kit_id string, ts timestamp, field string, value double, _corrupt string"
)


def read_measurements_csv(spark: SparkSession, path: str) -> DataFrame:
    """Long-format measurement CSV (kit_id, ts, field, value). Malformed
    rows land in `_corrupt` instead of failing the scan."""
    return (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(MEASUREMENT_SCHEMA)
        .csv(path)
    )


def read_measurements_xlsx(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """XLSX input (S8) via the stdlib zip+XML reader (sources/xlsx.py —
    shared strings, inline strings and numbers; sparse rows placed by
    cell reference). openpyxl, when present, handles anything fancier
    (dates-as-styles, multiple sheets by name); the codec gate is only
    for that tier now, not for reading tabular sheets at all."""
    try:
        import openpyxl  # noqa: F401

        have_openpyxl = True
    except ImportError:
        have_openpyxl = False
    if have_openpyxl:  # pragma: no cover - absent in container
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet)
        return spark.createDataFrame(pdf)
    if sheet not in (0, None):
        # the stdlib reader reads the FIRST sheet only; silently
        # returning another sheet's data would be worse than the error
        raise ImportError(
            f"selecting sheet {sheet!r} needs openpyxl; the stdlib XLSX "
            f"reader handles only the first worksheet"
        )
    from .xlsx import read_xlsx

    rows = read_xlsx(path)
    if not rows:
        raise ValueError(f"{path}: empty or headerless sheet")
    # build Rows directly, NOT via pandas: pd.DataFrame turns None into
    # NaN for numeric columns, which breaks SQL NULL semantics (IS NULL
    # misses, aggregates propagate NaN — the cross-engine parity rules)
    from pyspark.sql import Row

    cols = list(rows[0].keys())
    return spark.createDataFrame([Row(**{c: r[c] for c in cols}) for r in rows])
