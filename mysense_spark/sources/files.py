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
    """XLSX input via openpyxl -> createDataFrame. Raises ImportError
    with a clear message when the codec is absent (this container)."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError as e:  # pragma: no cover - absent in container
        raise ImportError(
            "XLSX input needs openpyxl; install it or convert the sheet "
            "to CSV and use read_measurements_csv"
        ) from e
    pdf = pd.read_excel(path, sheet_name=sheet)  # pragma: no cover
    return spark.createDataFrame(pdf)  # pragma: no cover
