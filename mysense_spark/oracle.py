"""Local replica of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle SQL on the same parquet tables, compare
row-count + column names + order-insensitive values.

Used by tests/ to catch oracle drift before the driver does.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from .io import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[col] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[col] = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") else v)
        elif pd.api.types.is_integer_dtype(s):
            df[col] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[col] = s.astype("bool")
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    return df


@dataclass
class CompareResult:
    ok: bool
    detail: str


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, float_tol: float = 0.0) -> CompareResult:
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return CompareResult(False, f"columns differ: {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}")
    if len(spark_df) != len(oracle_df):
        return CompareResult(False, f"row count differs: {len(spark_df)} vs {len(oracle_df)}")
    a, b = _normalize(spark_df), _normalize(oracle_df)
    for col in a.columns:
        sa, sb = a[col], b[col]
        # Driver-gate parity: the driver hashes canonicalized values, so an
        # int64 column on one side vs float64 on the other (the DuckDB
        # sum(BIGINT)->HUGEINT->float64 trap) mismatches even when every
        # value is numerically equal. Treat dtype-class drift as a failure.
        int_a, int_b = pd.api.types.is_integer_dtype(sa), pd.api.types.is_integer_dtype(sb)
        if int_a != int_b:
            return CompareResult(
                False,
                f"col {col}: dtype class differs: {sa.dtype} vs {sb.dtype} "
                "(DuckDB HUGEINT? cast the oracle aggregate to BIGINT)",
            )
        # float-vs-object(Decimal) drift is the other driver-hash killer:
        # Spark DecimalType arrives in pandas as object(Decimal) while the
        # oracle emits float64, and pd.to_numeric below would silently
        # coerce both to float64 and "pass" — exactly how the r3/r4
        # station_calibration red survived a green local check. Fail it.
        float_a, float_b = pd.api.types.is_float_dtype(sa), pd.api.types.is_float_dtype(sb)
        if float_a != float_b:
            return CompareResult(
                False,
                f"col {col}: dtype class differs: {sa.dtype} vs {sb.dtype} "
                "(Spark DecimalType vs DOUBLE oracle? CAST the Spark projection AS DOUBLE)",
            )
        if float_a or float_b:
            sa = pd.to_numeric(sa, errors="coerce").astype("float64")
            sb = pd.to_numeric(sb, errors="coerce").astype("float64")
            na_mismatch = sa.isna() != sb.isna()
            if na_mismatch.any():
                i = int(na_mismatch.idxmax())
                return CompareResult(False, f"col {col}: NULL mismatch at sorted row {i}: {sa[i]} vs {sb[i]}")
            diff = (sa - sb).abs()
            maxdiff = float(diff.max()) if len(diff) and not diff.isna().all() else 0.0
            if maxdiff is not None and not math.isnan(maxdiff) and maxdiff > float_tol:
                i = int(diff.idxmax())
                return CompareResult(False, f"col {col}: max diff {maxdiff} at sorted row {i}: {sa[i]} vs {sb[i]}")
        else:
            eq = (sa == sb) | (sa.isna() & sb.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                return CompareResult(False, f"col {col}: mismatch at sorted row {i}: {sa[i]!r} vs {sb[i]!r}")
    return CompareResult(True, "ok")


def check_query(spark, name: str, sf_dir: str, float_tol: float = 0.0) -> CompareResult:
    from .queries import registry

    fn, sql = registry()[name]
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        return CompareResult(len(sdf) >= 0, f"rows-only: {len(sdf)} rows")
    odf = run_oracle(sql, sf_dir)
    return compare_frames(sdf, odf, float_tol=float_tol)
