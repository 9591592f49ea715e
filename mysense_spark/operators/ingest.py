"""Ingest pipeline as a graded query: the full TTN-normalize -> LoRa-decode
-> long-format -> validate chain (SURVEY.md §3.1) over the reference's own
golden replay records, checked against an oracle built from the expected
`payload_fields` embedded in those records (inputtests/TTN-testsuite.mqtt).

This puts S2/S3/S4/P1/P2 on the driver's hash-checked surface: the oracle
is an independent VALUES literal, not a re-run of our code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load, values_df
from ..streaming.pipeline import decode_stream
from ..sources.ttn import parse_envelopes

_FIXTURE_LINES = [
    # reference TTN-testsuite.mqtt records (V2) + a synthetic V3 twin
    '201802215971az/devices/lopyprototype20180404/up {"app_id":"201802215971az","dev_id":"lopyprototype20180404","hardware_serial":"D4973556E6375616","port":2,"counter":19942,"payload_raw":"hQAAAJsArgF4A3oD+gEOAJw=","metadata":{"time":"2020-11-07T23:48:20.220189142Z","airtime":71936000,"gateways":[{"gtw_id":"eui-7276ff000b032609","rssi":-123,"snr":-6.2}]}}',
    '201802215971az/devices/bwlvc-9cd5/up {"app_id":"201802215971az","dev_id":"bwlvc-9cd5","hardware_serial":"AAAAB4E62DF49CD5","port":4,"counter":14382,"payload_raw":"jwDcAV4BmoADeMctaQMPAIkANAF6A2ED/QEMAR8ATr4SAAj1GgAAAVw=","metadata":{"time":"2020-11-07T23:49:01.38602329Z","airtime":102656000,"gateways":[{"gtw_id":"gateway_sint_anthonis_003","rssi":-102,"snr":7}]}}',
    'v3/app1@ttn/devices/lopy-v3/up {"end_device_ids":{"device_id":"lopy-v3","dev_eui":"D4973556E6375616","application_ids":{"application_id":"app1"}},"received_at":"2021-09-01T10:00:00.5Z","uplink_message":{"f_port":2,"f_cnt":77,"frm_payload":"hQAAAJsArgF4A3oD+gEOAJw=","received_at":"2021-09-01T10:00:00.5Z","rx_metadata":[{"gateway_ids":{"gateway_id":"gw-v3-1"},"rssi":-90,"snr":9.5}]}}',
]

# (kit_id, ts, field, value, unit) — expected long-format output, derived
# from the golden payload_fields; ts = broker time minus LoRa airtime.
_LOPY_FIELDS = [
    ("pm25", 15.5, "ug/m3"),
    ("pm10", 17.4, "ug/m3"),
    ("temp", 7.6, "C"),
    ("rv", 89.0, "%"),
    ("luchtdruk", 1018.0, "hPa"),
    ("gas", 270.0, "kOhm"),
    ("aqi", 15.6, "%"),
]
_BWLVC_FIELDS = [
    ("pm1", 22.0, "ug/m3"),
    ("pm25", 35.0, "ug/m3"),
    ("pm10", 41.0, "ug/m3"),
    ("grain", 0.5, "um"),
    ("pm05_cnt", 3091.9, "pcs/dm3"),
    ("pm1_cnt", 4254.4, "pcs/dm3"),
    ("pm25_cnt", 4332.7, "pcs/dm3"),
    ("pm5_cnt", 4346.4, "pcs/dm3"),
    ("pm10_cnt", 4346.7, "pcs/dm3"),
    ("temp", 7.8, "C"),
    ("rv", 86.5, "%"),
    ("luchtdruk", 1021.0, "hPa"),
    ("gas", 268.0, "kOhm"),
    ("aqi", 28.7, "%"),
    ("lat", 51.60466, None),
    ("lon", 5.87034, None),
    ("alt", 34.8, None),
]

EXPECTED = (
    [
        ("201802215971az_lopyprototype20180404", "2020-11-07 23:48:20.148253", f, v, u)
        for f, v, u in _LOPY_FIELDS
    ]
    + [
        ("201802215971az_bwlvc-9cd5", "2020-11-07 23:49:01.283367", f, v, u)
        for f, v, u in _BWLVC_FIELDS
    ]
    + [("app1_lopy-v3", "2021-09-01 10:00:00.5", f, v, u) for f, v, u in _LOPY_FIELDS]
)


def q_ttn_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the ingest chain over the golden replay records (sf-independent)."""
    from pyspark.sql import functions as F

    # Pin tz: this query doesn't go through io.load (which pins UTC for
    # every table query — the engine-wide policy), and the driver's
    # session tz is unknown; the oracle's timestamps are UTC literals.
    # Deliberately NOT save/restored: session tz is read at COLLECT time
    # for the timestamp->pandas conversion, so restoring a non-UTC value
    # before the driver collects would shift the result. Every registered
    # query pins the same value on entry, so ordering cannot matter.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # VALUES literal (LocalRelation) + repartition(1): one task, one
    # python worker for the decode UDF; a python-list createDataFrame
    # would fan out to a 32-task python-RDD scan (~10 s first touch)
    lines = values_df(spark, [(l,) for l in _FIXTURE_LINES], "value string").repartition(1)
    fact = decode_stream(parse_envelopes(lines))
    # the chain is narrow from repartition(1) on, so the data is still one
    # partition here: sortWithinPartitions IS a total sort and skips the
    # range-partitioning sampling job a global orderBy would run
    return (
        fact.select("kit_id", "ts", "field", "value", "unit")
        .coalesce(1)
        .sortWithinPartitions("kit_id", "ts", "field")
    )


def _values_sql() -> str:
    rows = []
    for kit, ts, fld, val, unit in EXPECTED:
        u = "NULL" if unit is None else f"'{unit}'"
        rows.append(f"('{kit}', TIMESTAMP '{ts}', '{fld}', {val!r}, {u})")
    return ",\n       ".join(rows)


SQL_TTN_DECODE = f"""
SELECT kit_id, ts, field, value, unit
FROM (VALUES {_values_sql()}) AS t(kit_id, ts, field, value, unit)
ORDER BY kit_id, ts, field
"""


def q_station_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6+J5+R1 end-to-end: align each kit's hourly series against a
    reference station's hourly observations and fit the calibration line
    station ~ a0 + a1 * kit, with fit quality (r2, rmse, bias) — the
    MakeReports.sh correlation-report pipeline (statistics/
    MakeReports.sh:24-120: INTERVAL-bucketed series per table, then
    MyRegression fit against the BAM1020 reference column).

    The station side is sources/stations.synthetic_station_series —
    a deterministic hourly profile (no network in the sandbox), joined
    as a broadcast dimension keyed on the hour bucket: exactly the J5
    shape at scale (facts shuffle once on (kit, hour); the station table
    is ~1e2 stations x 24 rows/day and always broadcastable)."""
    from pyspark.sql import functions as F

    from ..sources.stations import station_value_sql
    from .util import exact_avg

    ev = load(spark, sf_dir, "events")
    hour = F.expr("unix_micros(ts) DIV 1000000 DIV 3600")
    kit_hourly = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.col("user_id"), hour.alias("h"))
        .agg(exact_avg(F.col("value"), 6).alias("x"))
    )
    # station series materialized from the observed hour range (the
    # sandbox profile); round(.,6) pins the transcendental to a fixed
    # decimal so both engines aggregate identical inputs
    from .util import sql_ieee_round

    station = kit_hourly.select("h").distinct().selectExpr(
        "h", f"{sql_ieee_round(station_value_sql('h'), 6)} AS y"
    )
    pairs = kit_hourly.join(F.broadcast(station), "h")
    dec = "decimal(18,6)"
    xd = F.col("x").cast(dec)
    yd = F.col("y").cast(dec)
    stats = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    n = F.col("n")
    return (
        stats.where(
            (n >= 5)
            & (n * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
            & (n * F.col("syy") - F.col("sy") * F.col("sy") > 0)
        )
        .selectExpr(
            "user_id",
            "n",
            "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS a1",
            "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS a0",
            "sxx - sx * sx / n AS cxx",
            "syy - sy * sy / n AS cyy",
            "sxy - sx * sy / n AS cxy",
            "(sy - sx) / n AS bias",
        )
        .selectExpr(
            "user_id",
            "n",
            # IEEE floor-form rounding: Spark round(double) disagrees
            # with DuckDB's on representation-edge values (util.ieee_round)
            f"{sql_ieee_round('a1', 6)} AS a1",
            f"{sql_ieee_round('a0', 6)} AS a0",
            f"{sql_ieee_round('a1 * cxy / cyy', 6)} AS r2",
            f"{sql_ieee_round('sqrt(greatest(cyy - a1 * cxy, 0.0) / n)', 6)} AS rmse",
            f"{sql_ieee_round('bias', 6)} AS bias",
        )
        .orderBy("user_id")
    )


def _sql_station_calibration() -> str:
    from ..sources.stations import station_value_sql
    from .util import sql_avg, sql_ieee_round

    return f"""
WITH kit_hourly AS (
  SELECT user_id, epoch_us(ts) // 1000000 // 3600 AS h,
         {sql_avg('value', 6)} AS x
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
station AS (
  SELECT h, {sql_ieee_round(station_value_sql('h'), 6)} AS y
  FROM (SELECT DISTINCT h FROM kit_hourly)
),
stats AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy
  FROM kit_hourly JOIN station USING (h)
  GROUP BY user_id
),
derived AS (
  SELECT user_id, n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS a1,
         (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS a0,
         sxx - sx * sx / n AS cxx,
         syy - sy * sy / n AS cyy,
         sxy - sx * sy / n AS cxy,
         (sy - sx) / n AS bias
  FROM stats
  WHERE n >= 5 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
)
SELECT user_id, n,
       {sql_ieee_round('a1', 6)} AS a1,
       {sql_ieee_round('a0', 6)} AS a0,
       {sql_ieee_round('a1 * cxy / cyy', 6)} AS r2,
       {sql_ieee_round('sqrt(greatest(cyy - a1 * cxy, 0.0) / n)', 6)} AS rmse,
       {sql_ieee_round('bias', 6)} AS bias
FROM derived
ORDER BY user_id
"""


SQL_STATION_CALIBRATION = _sql_station_calibration()


# --- S7: SensorThings paginated REST pull, driver-graded --------------------
#
# A deterministic in-process "server": 20 observations (the last two are
# exact duplicates of the first two — the duplicate-timestamp rows the
# reference drops, SamenMetenThings.py:1449-1474), served in pages of 6,
# plus one empty page past the end (the nextLink-exhausted case).
_ST_N_OBS = 18
_ST_PAGE = 6
_ST_T0 = 1709251200  # 2024-03-01T00:00:00Z


def _st_obs(i: int) -> dict:
    k = i % _ST_N_OBS  # 18,19 wrap to 0,1: identical duplicate rows
    from datetime import datetime, timezone

    ts = datetime.fromtimestamp(_ST_T0 + 1800 * k, tz=timezone.utc)
    return {
        "station": "NL10131",
        "phenomenonTime": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
        "result": 10.0 + ((k * 7) % 13) * 0.5,
    }


def _fake_sensorthings_fetch(url: str) -> str:
    """Injected transport (no network in this sandbox): serves the fixed
    dataset honoring the $top/$skip paging params the query builder set.
    Module-level so executors can unpickle it inside mapInPandas."""
    import json as _json
    import re as _re

    top = int(_re.search(r"\$top=(\d+)", url).group(1))
    skip = int(_re.search(r"\$skip=(\d+)", url).group(1))
    rows = [_st_obs(i) for i in range(skip, min(skip + top, _ST_N_OBS + 2))]
    return _json.dumps({"value": rows}) if rows else ""


def q_sensorthings_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 end-to-end through the real distributed reader: page fan-out
    over executors (sources/rest.read_paginated mapInPandas), then the
    reference's observation post-processing (parse ts, drop duplicate
    timestamps, time order). The transport is injected; the paging
    arithmetic, JSON decode, schema projection and dedup are all the
    production code path (sf-independent, like ttn_decode)."""
    from pyspark.sql import functions as F

    from ..sources.rest import observations_frame, read_paginated

    # UTC pin, same engine-wide policy (and same non-restore rationale)
    # as q_ttn_decode above / io.load
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = read_paginated(
        spark,
        _fake_sensorthings_fetch,
        "https://sensorthings.example/v1.1",
        "Observations",
        n_pages=5,  # 4 data pages + 1 empty page past the end
        schema="station string, phenomenonTime string, result double",
        select=["station", "phenomenonTime", "result"],
        orderby="phenomenonTime asc",
        page_size=_ST_PAGE,
    )
    return (
        # per-station dedup key: the reference's duplicate-ts drop is
        # within one datastream's series, and this pull spans stations
        observations_frame(raw, key_cols=("station",))
        .select("station", "ts", F.col("result").alias("value"))
        .orderBy("ts")
    )


def _sql_sensorthings_pull() -> str:
    rows = []
    for i in range(_ST_N_OBS):
        o = _st_obs(i)
        ts = o["phenomenonTime"].replace("T", " ").replace("Z", "")
        rows.append(f"('{o['station']}', TIMESTAMP '{ts}', {o['result']!r})")
    vals = ",\n       ".join(rows)
    return f"""
SELECT station, ts, value
FROM (VALUES {vals}) AS t(station, ts, value)
ORDER BY ts
"""


SQL_SENSORTHINGS_PULL = _sql_sensorthings_pull()


_CSV_FIXTURE = """kit_id,ts,field,value
kitA,2024-01-01T00:00:00,pm25,12.5
kitA,2024-01-01T01:00:00,pm25,13.1
kitA,2024-01-01T02:00:00,pm25,not-a-number
kitB,2024-01-01T00:00:00,temp,21.0
kitB,2024-01-01T01:00:00,temp,21.4
kitB,2024-01-01T02:00:00,temp,
this line is garbage
kitC,2024-01-01T00:00:00,rv,55.5
"""


def q_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: CSV measurement input through the real distributed reader
    (sources/files.read_measurements_csv) — schema-pinned scan, malformed
    rows quarantined to `_corrupt` (the reference dies on bad spreadsheet
    rows; at scale quarantine-and-continue is the recoverable version).
    Runs on a pinned fixture written to a temp dir so the driver can
    hash-check parsing semantics: good rows aggregate per kit, bad rows
    are counted, a blank value is NULL (not corrupt)."""
    import os
    import tempfile

    from ..sources.files import read_measurements_csv

    # one PINNED fixture dir keyed on the fixture's CONTENT hash, not a
    # fresh mkdtemp per call (a gate sweep / bench iteration would leak
    # a /tmp dir per call) and not the pid (a recycled pid could reuse a
    # stale file from an unrelated process; content-keying is idempotent
    # across processes and stale-proof — edit the fixture, get a new dir)
    import hashlib

    tag = hashlib.sha256(_CSV_FIXTURE.encode()).hexdigest()[:16]
    d = os.path.join(tempfile.gettempdir(), f"csv_ingest_fixture_{tag}")
    os.makedirs(d, exist_ok=True)
    fixture = os.path.join(d, "dump.csv")
    if not os.path.exists(fixture):
        tmp = f"{fixture}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            f.write(_CSV_FIXTURE)
        os.replace(tmp, fixture)  # atomic vs a concurrent bench/test process
    df = read_measurements_csv(spark, d)
    from pyspark.sql import functions as F

    return (
        df.groupBy(F.coalesce("kit_id", F.lit("<corrupt>")).alias("kit"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("value").alias("n_values"),
            F.count("_corrupt").alias("n_bad"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
                "sum_value"
            ),
        )
        .orderBy("kit")
    )


# note the garbage line: Spark CSV pads too-few-column rows with NULLs
# (only type mismatches set _corrupt), so it surfaces as a 1-row kit
# with no timestamp/value — the expectation documents that semantic
SQL_CSV_INGEST = """
SELECT kit, n_rows, n_values, n_bad, sum_value
FROM (VALUES
  ('kitA', 3, 2, 1, 25.6),
  ('kitB', 3, 2, 0, 42.4),
  ('kitC', 1, 1, 0, 55.5),
  ('this line is garbage', 1, 0, 0, CAST(NULL AS DOUBLE))
) AS t(kit, n_rows, n_values, n_bad, sum_value)
ORDER BY kit
"""


QUERIES: dict[str, tuple] = {
    "ttn_decode": (q_ttn_decode, SQL_TTN_DECODE),
    "station_calibration": (q_station_calibration, SQL_STATION_CALIBRATION),
    "sensorthings_pull": (q_sensorthings_pull, SQL_SENSORTHINGS_PULL),
    "csv_ingest": (q_csv_ingest, SQL_CSV_INGEST),
}
