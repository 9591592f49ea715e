"""Geospatial operators (P10, J7, W4): geohash encode/decode, haversine
distance, neighbour top-N search, geofence change-point detection.

The reference stores kit homes as geohash(12) strings and uses
ST_Distance_Sphere / GPS distance for the "kit moved > 118 m" rule
(lib/MyGPS.py, scripts/UpdateValidity.sh:188-205, SamenMetenThings.py:530-560).

Geohash is a pure deterministic bit-interleave — implemented here as
native Spark column expressions where possible and a vectorized fallback;
haversine is closed-form trig, fully codegen'd.

The synthetic star schema has no coordinates, so kit positions are derived
deterministically from customer keys (same formula in the SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from .util import sql_ieee_round

EARTH_RADIUS_M = 6371008.8

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: float, lon: float, precision: int = 12) -> str:
    """Scalar geohash encoder (public Geohash algorithm; reference uses
    python-geohash in lib/MyGPS.py). Used by tests and the kit registry."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(0, len(bits), 5):
        idx = 0
        for b in bits[i : i + 5]:
            idx = (idx << 1) | b
        out.append(_BASE32[idx])
    return "".join(out)


def geohash_decode(gh: str) -> tuple[float, float]:
    """Scalar geohash decoder -> (lat, lon) cell center."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for ch in gh:
        idx = _BASE32.index(ch)
        for shift in range(4, -1, -1):
            bit = (idx >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return ((lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2)


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters as a pure column expression
    (whole-stage codegen; the reference round-trips MySQL
    ST_Distance_Sphere per row)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def _sql_haversine(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2.0 * {EARTH_RADIUS_M!r} * asin(sqrt("
        f"sin(radians(({lat2}) - ({lat1})) / 2) * sin(radians(({lat2}) - ({lat1})) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2) * sin(radians(({lon2}) - ({lon1})) / 2)))"
    )


# deterministic synthetic kit coordinates from the customer dimension
_LAT = "50.0 + (c_custkey % 500) / 100.0"
_LON = "4.0 + (c_custkey % 700) / 100.0"


def _kit_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        (F.lit(50.0) + (F.col("c_custkey") % 500) / 100.0).alias("lat"),
        (F.lit(4.0) + (F.col("c_custkey") % 700) / 100.0).alias("lon"),
    )


def q_neighbour_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: stations within range of a point, top-N by distance
    (get_Neighbours, SamenMetenThings.py:1625-1744; Max 50). At scale the
    candidate pre-filter is a geohash-prefix bucket join; here the bounding
    predicate plays that role so the full haversine only runs on the
    pruned set."""
    from .util import ieee_round

    pos = _kit_positions(spark, sf_dir)
    qlat, qlon = 51.5, 5.5
    # cheap bounding-box prune (geohash-prefix analog) before exact distance
    pruned = pos.where((F.abs(F.col("lat") - qlat) < 2.0) & (F.abs(F.col("lon") - qlon) < 3.0))
    dist = haversine_m(F.col("lat"), F.col("lon"), F.lit(qlat), F.lit(qlon))
    # floor-form round before the threshold + top-50 cut: same
    # quantize-before-threshold parity rule as q_spatial_pairs
    return (
        pruned.withColumn("dist_m", ieee_round(dist, 3))
        .where(F.col("dist_m") < 150000)
        .orderBy(F.asc("dist_m"), F.asc("c_custkey"))
        .limit(50)
        .select("c_custkey", ieee_round(F.col("lat"), 6).alias("lat"), ieee_round(F.col("lon"), 6).alias("lon"), "dist_m")
    )


SQL_NEIGHBOUR_SEARCH = f"""
WITH pos AS (
  SELECT c_custkey, {_LAT} AS lat, {_LON} AS lon FROM customer
), pruned AS (
  SELECT * FROM pos WHERE abs(lat - 51.5) < 2.0 AND abs(lon - 5.5) < 3.0
)
SELECT c_custkey, {sql_ieee_round('lat', 6)} AS lat, {sql_ieee_round('lon', 6)} AS lon,
       {sql_ieee_round(_sql_haversine('lat', 'lon', '51.5', '5.5'), 3)} AS dist_m
FROM pruned
WHERE {sql_ieee_round(_sql_haversine('lat', 'lon', '51.5', '5.5'), 3)} < 150000
ORDER BY dist_m ASC, c_custkey ASC
LIMIT 50
"""


def q_geofence_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: geofence change-point detection (UpdateValidity.sh:188-205 awk
    state machine): emit boundaries where per-kit distance-from-home
    crosses the 118 m threshold. Home = first observed value per kit;
    distance proxy = |value - home| * 10 m. lag + change filter."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    home = F.first("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    withd = ev.withColumn("dist_m", F.round(F.abs(F.col("value") - home) * 10, 4))
    flagged = withd.withColumn("outside", F.col("dist_m") > 118.0).withColumn(
        "prev_outside", F.lag("outside").over(w)
    )
    return (
        flagged.where(F.col("prev_outside").isNotNull() & (F.col("outside") != F.col("prev_outside")))
        .select("user_id", "ts", "dist_m", "outside")
        .orderBy("user_id", "ts")
    )


SQL_GEOFENCE_TRANSITIONS = """
WITH based AS (
  SELECT user_id, ts, event_id,
         round(abs(value - first_value(value) OVER w) * 10, 4) AS dist_m
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
), flagged AS (
  SELECT user_id, ts, dist_m, dist_m > 118.0 AS outside,
         lag(dist_m > 118.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_outside
  FROM based
)
SELECT user_id, ts, dist_m, outside
FROM flagged
WHERE prev_outside IS NOT NULL AND outside <> prev_outside
ORDER BY user_id, ts
"""


_PAIR_DIST_M = 2000.0
_CELL_CENTI = 5  # cell = 0.05 deg (~5.5 km lat / ~3.4 km lon at 52N) >= pair radius


def q_spatial_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join: all kit pairs within 2 km — the distributed
    all-pairs-within-distance pattern (who can cross-calibrate against
    whom). Grid-cell bucketing is the spatial LSH: one side keeps its
    home cell, the other replicates into its 3x3 cell neighborhood, the
    join is a plain equi-join on cell, and the exact haversine verifies
    candidates. A pair lands in the candidate set EXACTLY once (the
    replica matching the other point's home cell is unique), so no
    dedup pass is needed.

    Cells come from integer centi-degrees (round(lat*100) DIV 5) — a
    float floor(lat/0.05) sits a ulp from cell boundaries and both
    engines must bucket identically.

    Scale shape: 9x replication on one side, one shuffle join on the
    cell key, exact distance only on co-celled candidates — O(N * local
    density) instead of O(N^2). The classic Sedona/GeoSpark join without
    the dependency.
    """
    pos = _kit_positions(spark, sf_dir)
    home = pos.select(
        F.col("c_custkey").alias("k1"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
        F.expr(f"CAST(round(lat * 100, 0) AS BIGINT) DIV {_CELL_CENTI}").alias("ci"),
        F.expr(f"CAST(round(lon * 100, 0) AS BIGINT) DIV {_CELL_CENTI}").alias("cj"),
    )
    nbr_cells = F.expr(
        "explode(flatten(transform(sequence(-1, 1), di -> "
        "transform(sequence(-1, 1), dj -> struct(ci + di AS ci, cj + dj AS cj)))))"
    )
    repl = pos.select(
        F.col("c_custkey").alias("k2"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        F.expr(f"CAST(round(lat * 100, 0) AS BIGINT) DIV {_CELL_CENTI}").alias("ci"),
        F.expr(f"CAST(round(lon * 100, 0) AS BIGINT) DIV {_CELL_CENTI}").alias("cj"),
    ).select("k2", "lat2", "lon2", nbr_cells.alias("cell")).select(
        "k2", "lat2", "lon2", F.col("cell.ci").alias("ci"), F.col("cell.cj").alias("cj")
    )
    from .util import ieee_round

    dist = haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
    # quantize-before-threshold with the engine-agnostic floor-form round:
    # the haversine runs through libm trig independently per engine, and
    # with F.round vs native round a representation-edge value can flip
    # ROW MEMBERSHIP at the <= boundary, not just a last digit
    return (
        home.join(repl, ["ci", "cj"])
        .where(F.col("k1") < F.col("k2"))
        .withColumn("dist_m", ieee_round(dist, 3))
        .where(F.col("dist_m") <= _PAIR_DIST_M)
        .select("k1", "k2", "dist_m")
        .orderBy("k1", "k2")
    )


# the oracle is EXHAUSTIVE O(N^2) — a different algorithm reaching the
# same rows, which is exactly what proves the cell join loses no pair
SQL_SPATIAL_PAIRS = f"""
WITH pos AS (
  SELECT c_custkey, {_LAT} AS lat, {_LON} AS lon FROM customer
)
SELECT a.c_custkey AS k1, b.c_custkey AS k2,
       {sql_ieee_round(_sql_haversine('a.lat', 'a.lon', 'b.lat', 'b.lon'), 3)} AS dist_m
FROM pos a JOIN pos b ON a.c_custkey < b.c_custkey
WHERE {sql_ieee_round(_sql_haversine('a.lat', 'a.lon', 'b.lat', 'b.lon'), 3)} <= {_PAIR_DIST_M}
ORDER BY k1, k2
"""


QUERIES: dict[str, tuple] = {
    "neighbour_search": (q_neighbour_search, SQL_NEIGHBOUR_SEARCH),
    "geofence_transitions": (q_geofence_transitions, SQL_GEOFENCE_TRANSITIONS),
    "spatial_pairs": (q_spatial_pairs, SQL_SPATIAL_PAIRS),
}
