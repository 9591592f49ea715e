"""TTN MQTT envelope normalization (S2/S3): one declarative transform that
handles both V2 (`payload_raw`, `metadata`) and V3
(`uplink_message.frm_payload`, `rx_metadata`) envelopes, batch or stream.

Reference semantics (lib/MyMQTTclient.py:323-425 RecordImport):
- V2 vs V3 detected by which payload field is present (coalesce here)
- event time = broker `time`/`received_at` minus LoRa airtime
  (airtime is nanoseconds in the envelope), fallback ingest time
- gateways normalized to an ordered array of (id, rssi, snr, lat, lon)
  with signal strength 10*snr + 0.2*rssi (GTWstrength,
  MyDatacollector.py:1467-1500), best gateway first

Everything is `from_json` + column expressions — the same DataFrame works
under `spark.read` (file replay, S2) and `spark.readStream` (live brokers),
which is the batch/stream parity the reference proves with its .mqtt
replay corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_GATEWAY_V2 = StructType(
    [
        StructField("gtw_id", StringType()),
        StructField("rssi", DoubleType()),
        StructField("snr", DoubleType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
    ]
)

ENVELOPE_SCHEMA = StructType(
    [
        # V2
        StructField("app_id", StringType()),
        StructField("dev_id", StringType()),
        StructField("hardware_serial", StringType()),
        StructField("port", IntegerType()),
        StructField("counter", LongType()),
        StructField("payload_raw", StringType()),
        StructField(
            "metadata",
            StructType(
                [
                    StructField("time", StringType()),
                    StructField("airtime", LongType()),
                    StructField("gateways", ArrayType(_GATEWAY_V2)),
                ]
            ),
        ),
        # V3
        StructField(
            "end_device_ids",
            StructType(
                [
                    StructField("device_id", StringType()),
                    StructField("dev_eui", StringType()),
                    StructField(
                        "application_ids",
                        StructType([StructField("application_id", StringType())]),
                    ),
                ]
            ),
        ),
        StructField("received_at", StringType()),
        StructField(
            "uplink_message",
            StructType(
                [
                    StructField("f_port", IntegerType()),
                    StructField("f_cnt", LongType()),
                    StructField("frm_payload", StringType()),
                    StructField("received_at", StringType()),
                    StructField(
                        "rx_metadata",
                        ArrayType(
                            StructType(
                                [
                                    StructField(
                                        "gateway_ids",
                                        StructType([StructField("gateway_id", StringType())]),
                                    ),
                                    StructField("rssi", DoubleType()),
                                    StructField("snr", DoubleType()),
                                ]
                            )
                        ),
                    ),
                    StructField(
                        "settings",
                        StructType([StructField("airtime", StringType())]),
                    ),
                ]
            ),
        ),
    ]
)


def _strip_topic(line: Column) -> Column:
    """MQTT dump lines are `topic {json}` — keep the JSON part."""
    return F.when(line.startswith("{"), line).otherwise(
        F.expr("substring(value, instr(value, '{'))")
    )


def envelope_identity(r: Column) -> Column:
    """Device identity across both envelope versions — NULL means the
    line carries no recognizable envelope (corrupt/truncated/foreign)."""
    return F.coalesce(
        r.getField("app_id"),
        r.getField("end_device_ids").getField("application_ids").getField("application_id"),
        r.getField("dev_id"),
        r.getField("end_device_ids").getField("device_id"),
    )


def parse_envelopes(lines: DataFrame) -> DataFrame:
    """text lines (column `value`) -> normalized record columns.

    Output: app_id, dev_id, serial, port, counter, payload_raw, event_ts,
    gateways (strength-ordered), n_gateways, best_gateway, best_rssi.
    """
    # corruption filter: PERMISSIVE from_json yields an ALL-NULL struct
    # (not a NULL struct) for malformed JSON, so `r IS NOT NULL` would be
    # vacuous — a truncated dump line would flow through as a no-identity
    # record. A real envelope always carries device identity; lines
    # without any are the envelope_dead_letters side output's job
    # (streaming/pipeline.py), which preserves the raw line for replay.
    rec = lines.select(
        F.from_json(_strip_topic(F.col("value")), ENVELOPE_SCHEMA).alias("r"),
        F.current_timestamp().alias("ingest_ts"),
    ).where(envelope_identity(F.col("r")).isNotNull())

    is_v2 = F.col("r.payload_raw").isNotNull()
    raw_time = F.coalesce(
        F.col("r.metadata.time"), F.col("r.uplink_message.received_at"), F.col("r.received_at")
    )
    # ISO8601 with fractional seconds and Z suffix; V2 airtime is ns,
    # V3 carries a duration string ("0.061696s") in settings.airtime —
    # both reduce to microseconds so BOTH envelope versions get the
    # documented time-minus-airtime event timestamp.
    # try_to_timestamp / try_cast, NOT to_timestamp / CAST: under ANSI
    # mode (Spark 4 default) ONE envelope with a malformed time or
    # airtime string would throw CAST_INVALID_INPUT and kill the whole
    # batch — the r12 mutation battery surfaced both. NULL falls through
    # the coalesce to the documented fallbacks (ingest time; airtime 0).
    t = F.try_to_timestamp(raw_time)
    airtime_us = F.expr(
        "coalesce(r.metadata.airtime DIV 1000,"
        " try_cast(try_cast(rtrim('s', r.uplink_message.settings.airtime) AS DOUBLE)"
        " * 1000000 AS BIGINT),"
        " 0)"
    )
    # try_subtract, not `-`: an adversarial airtime near LONG_MIN passes
    # try_cast (it IS a valid bigint) and then the plain subtraction
    # overflows — ANSI ARITHMETIC_OVERFLOW, batch dead (r12 review
    # catch). NULL falls through the coalesce to ingest time.
    event_ts = F.coalesce(
        F.timestamp_micros(F.try_subtract(F.unix_micros(t), airtime_us)),
        F.col("ingest_ts"),
    )

    gw_v2 = F.expr(
        "transform(r.metadata.gateways, g -> struct(g.gtw_id as gtw_id, g.rssi as rssi,"
        " g.snr as snr, 10 * g.snr + 0.2 * g.rssi as strength))"
    )
    gw_v3 = F.expr(
        "transform(r.uplink_message.rx_metadata, g -> struct(g.gateway_ids.gateway_id as gtw_id,"
        " g.rssi as rssi, g.snr as snr, 10 * g.snr + 0.2 * g.rssi as strength))"
    )
    gateways = F.coalesce(gw_v2, gw_v3, F.array())
    ordered = F.reverse(F.array_sort(gateways, lambda a, b: F.when(a.strength < b.strength, -1).when(a.strength > b.strength, 1).otherwise(0)))

    return rec.select(
        F.coalesce(F.col("r.app_id"), F.col("r.end_device_ids.application_ids.application_id")).alias("app_id"),
        F.coalesce(F.col("r.dev_id"), F.col("r.end_device_ids.device_id")).alias("dev_id"),
        F.coalesce(F.col("r.hardware_serial"), F.col("r.end_device_ids.dev_eui")).alias("serial"),
        F.coalesce(F.col("r.port"), F.col("r.uplink_message.f_port")).alias("port"),
        F.coalesce(F.col("r.counter"), F.col("r.uplink_message.f_cnt")).alias("counter"),
        F.coalesce(F.col("r.payload_raw"), F.col("r.uplink_message.frm_payload")).alias("payload_raw"),
        event_ts.alias("event_ts"),
        F.col("ingest_ts"),
        ordered.alias("gateways"),
        F.size(gateways).alias("n_gateways"),
        # F.get, not getItem: an envelope with NO gateways (empty or
        # absent rx_metadata — real TTN traffic) makes getItem(0) throw
        # INVALID_ARRAY_INDEX under ANSI mode and kill the whole batch;
        # get() yields NULL for the out-of-bounds index
        F.get(ordered, 0).getField("gtw_id").alias("best_gateway"),
        F.get(ordered, 0).getField("rssi").alias("best_rssi"),
    )
