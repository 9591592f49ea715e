"""K5: Influx line-protocol and MQTT republish sinks behind the shared
foreachBatch contract (same injected-transport + circuit-breaker shape
as sinks/forward.py).

Reference semantics:
- RPi/MyINFLUXPUB.py:120-162 Influx_write: one line-protocol record per
  measurement — `<measurement>,<tag=v,...> <field=v,...> <timestamp>`,
  string values quoted, commas escaped.
- RPi/MyMQTTPUB.py:204-266: topic `<prefix>/<project>/<serial>` with a
  JSON telegram per record.

Spark-first split: the serialization (line protocol / topic + JSON) is a
pure DataFrame transform — JVM string expressions, testable and
distributed — and only the final transport callback touches the
injected client, per partition on the executors (foreachPartition). The
driver never materializes a micro-batch: it sees ok/err accumulator
scalars, which feed the shared circuit breaker that gates future
batches."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .forward import CircuitBreaker, drain_breaker as _drain_breaker


def _publishable(fact: DataFrame) -> DataFrame:
    """Pre-serialization normalization shared by both republishers:
    NULL values are dropped (a NULL cannot be represented in line
    protocol — concat_ws would silently emit a bare `field` token that
    corrupts the record and gets the whole write batch rejected — nor in
    the MQTT JSON map), and duplicate (kit, ts, field) rows collapse by
    averaging (A8 duplicate-field semantics; two rows for one field
    would otherwise throw DUPLICATED_MAP_KEY in map_from_entries and
    kill the micro-batch on any pre-dedup redelivery)."""
    return (
        fact.where(F.col("value").isNotNull())
        .groupBy("kit_id", "ts", "field")
        .agg(F.avg("value").alias("value"))
    )


def to_influx_lines(fact: DataFrame, measurement: str = "raw") -> DataFrame:
    """Long fact rows -> one line-protocol string per (kit, ts):
    `raw,kit=<kit_id> <field>=<v>,... <epoch_ns>` (MyINFLUXPUB.py
    Influx_write field/tag assembly, with the same comma-escape rule)."""
    esc = F.regexp_replace(F.col("kit_id"), ",", r"\\,")
    fields = F.array_sort(
        F.collect_list(F.concat_ws("=", F.col("field"), F.col("value").cast("string")))
    )
    return (
        _publishable(fact).groupBy("kit_id", "ts")
        .agg(fields.alias("fields"))
        .select(
            F.concat(
                F.lit(measurement + ",kit="),
                esc,
                F.lit(" "),
                F.array_join("fields", ","),
                F.lit(" "),
                (F.unix_micros("ts") * 1000).cast("string"),
            ).alias("line")
        )
    )


def to_mqtt_messages(fact: DataFrame, prefix: str = "IoS") -> DataFrame:
    """Long fact rows -> (topic, payload-JSON) per (kit, ts): topic
    `<prefix>/<kit_id>` with the field map as the telegram
    (MyMQTTPUB.py:204-206 topic layout)."""
    return (
        _publishable(fact).groupBy("kit_id", "ts")
        .agg(F.map_from_entries(F.collect_list(F.struct("field", "value"))).alias("data"))
        .select(
            F.concat_ws("/", F.lit(prefix), F.col("kit_id")).alias("topic"),
            F.to_json(
                F.struct(F.col("kit_id"), F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ssXXX").alias("ts"), F.col("data"))
            ).alias("payload"),
        )
    )


def make_influx_publisher(
    transport: Callable[[str, list[str]], bool],
    host: str = "influx.local",
    measurement: str = "raw",
    breaker: CircuitBreaker | None = None,
    batch_lines: int = 500,
):
    """foreachBatch sink: serialize the micro-batch to line protocol and
    hand the lines to `transport(host, lines) -> ok` in bounded chunks
    (MyINFLUXPUB.py posts per-record; batching is the at-scale version).

    The chunked writes run per PARTITION on executors (foreachPartition);
    the driver sees only ok/err accumulator counts for breaker gating —
    no micro-batch materialization (round-3 verdict #2)."""
    breaker = breaker or CircuitBreaker()
    # one accumulator pair per sink, reused across batches (a per-batch
    # pair leaks permanently in the driver's accumulator registry); the
    # breaker consumes per-batch deltas against the running totals
    state = {"accs": None, "seen": (0, 0)}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not breaker.allow(host):
            return
        sc = batch_df.sparkSession.sparkContext
        if state["accs"] is None:
            state["accs"] = (sc.accumulator(0), sc.accumulator(0))
        ok_acc, err_acc = state["accs"]
        thr = breaker.threshold

        def write_partition(rows) -> None:
            errs = 0
            buf: list[str] = []

            def flush() -> None:
                nonlocal errs
                # clear BEFORE the tripped-breaker check: once the
                # cut-off latches, the partition must stop buffering
                # too, or the buffer grows unboundedly while nothing
                # will ever be sent
                if errs >= thr:
                    buf.clear()
                    return
                if not buf:
                    return
                ok = transport(host, list(buf))
                (ok_acc if ok else err_acc).add(1)
                errs = 0 if ok else errs + 1
                buf.clear()

            for row in rows:
                if errs >= thr:
                    break
                buf.append(row["line"])
                if len(buf) >= batch_lines:
                    flush()
            flush()

        to_influx_lines(batch_df, measurement).foreachPartition(write_partition)
        # read each accumulator ONCE: counts landing between two reads
        # (straggler/speculative tasks) would otherwise be absorbed into
        # state["seen"] without ever reaching the breaker
        ok_v, err_v = ok_acc.value, err_acc.value
        prev_ok, prev_err = state["seen"]
        _drain_breaker(breaker, host, ok_v - prev_ok, err_v - prev_err)
        state["seen"] = (ok_v, err_v)

    return sink


def make_mqtt_republisher(
    publish: Callable[[str, str], bool],
    prefix: str = "IoS",
    breaker: CircuitBreaker | None = None,
    host: str = "mqtt.local",
):
    """foreachBatch sink: one publish(topic, payload) per (kit, ts),
    fanned out per partition on executors with local error cut-off;
    driver breaker fed by accumulator counts (no collect)."""
    breaker = breaker or CircuitBreaker()
    # one accumulator pair per sink, reused across batches (a per-batch
    # pair leaks permanently in the driver's accumulator registry); the
    # breaker consumes per-batch deltas against the running totals
    state = {"accs": None, "seen": (0, 0)}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not breaker.allow(host):
            return
        sc = batch_df.sparkSession.sparkContext
        if state["accs"] is None:
            state["accs"] = (sc.accumulator(0), sc.accumulator(0))
        ok_acc, err_acc = state["accs"]
        thr = breaker.threshold

        def publish_partition(rows) -> None:
            errs = 0
            for row in rows:
                if errs >= thr:
                    break
                ok = publish(row["topic"], row["payload"])
                (ok_acc if ok else err_acc).add(1)
                errs = 0 if ok else errs + 1

        to_mqtt_messages(batch_df, prefix).foreachPartition(publish_partition)
        # single accumulator read (same straggler rationale as the
        # influx sink above)
        ok_v, err_v = ok_acc.value, err_acc.value
        prev_ok, prev_err = state["seen"]
        _drain_breaker(breaker, host, ok_v - prev_ok, err_v - prev_err)
        state["seen"] = (ok_v, err_v)

    return sink
