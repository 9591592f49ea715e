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


def _xlsx_schema(rows: list[dict], cols: list[str]):
    """Explicit Spark schema for read_xlsx output, replacing
    createDataFrame inference — which raises [CANNOT_MERGE_TYPE] on the
    most common real-sheet shape: a measurement column mixing 21.5 and
    22 (Excel stores 22.0 as '22', which the codec reads back as int).
    Per column: any float present -> double (ints widened below); pure
    int stays long so 2^53+1 ids survive; any str present -> string
    (sheets spell missing numbers 'NA'); pure datetime (the r9
    dates-as-styles tier) -> timestamp, datetime mixed with anything ->
    string (ISO render); all-None -> string (no evidence; string is the
    safe carrier)."""
    import datetime as dt

    from pyspark.sql import types as T

    fields = []
    for c in cols:
        vals = [r.get(c) for r in rows if r.get(c) is not None]
        if not vals:
            t = T.StringType()
        elif any(isinstance(v, str) for v in vals):
            t = T.StringType()
        elif all(isinstance(v, bool) for v in vals):
            t = T.BooleanType()
        elif all(isinstance(v, dt.datetime) for v in vals):
            t = T.TimestampType()
        elif any(isinstance(v, dt.datetime) for v in vals):
            t = T.StringType()
        elif any(isinstance(v, float) for v in vals):
            t = T.DoubleType()
        else:
            t = T.LongType()
        fields.append(T.StructField(c, t, True))
    return T.StructType(fields)


def read_measurements_xlsx(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """XLSX input (S8) via the stdlib zip+XML reader (sources/xlsx.py —
    shared strings, inline strings and numbers; sparse rows placed by
    cell reference; sheets selected by workbook name or index; r9:
    date-styled numeric cells convert to timestamps via styles.xml,
    honoring the 1904 epoch flag). openpyxl, when present, is used as a
    fast path; nothing value-relevant needs it anymore."""
    try:
        import openpyxl  # noqa: F401

        have_openpyxl = True
    except ImportError:
        have_openpyxl = False
    if have_openpyxl:  # pragma: no cover - absent in container
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet)
        return spark.createDataFrame(pdf)
    from .xlsx import read_xlsx

    rows = read_xlsx(path, sheet=0 if sheet is None else sheet)
    if not rows:
        raise ValueError(f"{path}: empty or headerless sheet")
    # build plain tuples against an EXPLICIT schema, NOT via pandas
    # (pd.DataFrame turns None into NaN for numeric columns, breaking
    # SQL NULL semantics) and NOT via inference (mixed int/float or
    # all-None columns raise [CANNOT_MERGE_TYPE] / cannot infer)
    cols = list(rows[0].keys())
    schema = _xlsx_schema(rows, cols)
    str_cols = {f.name for f in schema.fields if f.dataType.typeName() == "string"}
    dbl_cols = {f.name for f in schema.fields if f.dataType.typeName() == "double"}

    def coerce(c: str, v):
        if v is None:
            return None
        if c in str_cols:
            return v if isinstance(v, str) else str(v)
        if c in dbl_cols:
            return float(v)
        return v

    data = [tuple(coerce(c, r.get(c)) for c in cols) for r in rows]
    return spark.createDataFrame(data, schema)
