"""R7: calibration coefficient round-trip — fit Taylor coefficients from
field data against a reference series, store them in the sensor-type
catalog, re-apply them at ingest (P8).

Reference flow: MyRegression fits per-kit polynomials, MakeReports.sh
writes them into SensorTypes.fields / Sensors.description
(scripts/CorrectSensed.pl:249,322; MySQLdbSetup.sql:85), and the ingest
path applies them (lib/MyARCHIVE.py:267-300). Here the catalog is a
DataFrame maintained by a batch job and broadcast into the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .regression import q_linear_regression


def fit_calibration_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit y ~ a0 + a1*x per kit (R1 on the J2-aligned series) and emit a
    calibration catalog (kit_id, a0, a1, r2, n)."""
    fits = q_linear_regression(spark, sf_dir)
    return fits.select(
        F.col("user_id").alias("kit_id"),
        F.col("intercept").alias("a0"),
        F.col("slope").alias("a1"),
        "r2",
        "n",
    )


def apply_calibration(measurements: DataFrame, catalog: DataFrame, value_col: str = "value") -> DataFrame:
    """P8 at ingest: value' = a0 + a1 * value via broadcast catalog join;
    kits without coefficients pass through unchanged (identity chain)."""
    out = measurements.join(F.broadcast(catalog), "kit_id", "left")
    calibrated = F.when(
        F.col("a1").isNotNull(), F.col("a0") + F.col("a1") * F.col(value_col)
    ).otherwise(F.col(value_col))
    return out.withColumn("calibrated", calibrated).drop("a0", "a1", "r2", "n")
