"""Custom stateful streaming operators (SURVEY.md §2.11) via
applyInPandasWithState — the semantics Spark has no built-in for:

- static-value detection (FluctCheck, MyDatacollector.py:814-845):
  per (kit, field) count of consecutive identical values; a notice fires
  when the count reaches the per-field trigger (registry STATIC_TRIGGERS).
- per-device rate throttle (IsBehavingKit, MyDatacollector.py:937-970):
  running interval estimate capped at 30 min; a kit sending faster than
  the rate floor (480 s) after 3 records gets its records dropped with a
  4 h penalty.

Both have deterministic BATCH TWINS (window functions) used by tests to
prove parity — the reference proves the same with file replay.

State is keyed by kit (and field) — exactly the partitioning the state
store shards on, so a million-device fleet spreads over executors evenly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..registry import STATIC_TRIGGER_DEFAULT, STATIC_TRIGGERS

THROTTLE_RATE_S = 480  # 8 min floor between datagrams
THROTTLE_MIN_COUNT = 3
THROTTLE_PENALTY_S = 4 * 3600
INTERVAL_CAP_S = 1800

_STATIC_OUT = StructType(
    [
        StructField("kit_id", StringType()),
        StructField("field", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("run_len", IntegerType()),
    ]
)
_STATIC_STATE = StructType(
    [StructField("last_value", DoubleType()), StructField("run_len", IntegerType())]
)


def _static_trigger(field: str) -> int:
    return STATIC_TRIGGERS.get(field, STATIC_TRIGGER_DEFAULT)


def static_value_monitor(fact_stream: DataFrame) -> DataFrame:
    """Streaming static-sensor detector: emits one row each time a
    (kit, field) run of identical values reaches its trigger length."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        kit_id, field = key
        trigger = _static_trigger(field)
        last_value, run_len = state.get if state.exists else (None, 0)
        out: list[tuple] = []
        # sort the WHOLE group once: pdfs delivers one Arrow chunk at a
        # time (maxRecordsPerBatch=10000), and per-chunk sorting would
        # process a >10k-row group out of time order at chunk boundaries
        chunks = [c for c in pdfs if len(c)]
        # stable sort: records sharing a timestamp keep arrival order —
        # pandas' default quicksort would make run lengths for
        # duplicate-ts input nondeterministic across runs
        pdf = (
            pd.concat(chunks).sort_values("ts", kind="stable")
            if chunks
            else pd.DataFrame(columns=["ts", "value"])
        )
        if len(pdf):
            for ts, value in zip(pdf["ts"], pdf["value"]):
                # NULL (None or NaN) always resets the run — same contract
                # as the batch twin's null-safe new_run predicate
                v = None if value is None or pd.isna(value) else float(value)
                if v is not None and last_value is not None and v == last_value:
                    run_len += 1
                    if run_len == trigger:
                        out.append((kit_id, field, ts, v, int(run_len)))
                else:
                    run_len = 1
                    last_value = v
        state.update((last_value, run_len))
        yield pd.DataFrame(out, columns=[f.name for f in _STATIC_OUT.fields])

    return fact_stream.groupBy("kit_id", "field").applyInPandasWithState(
        fn, _STATIC_OUT, _STATIC_STATE, "append", GroupStateTimeout.NoTimeout
    )


def static_value_monitor_batch(
    fact: DataFrame,
    triggers: dict[str, int] | None = None,
    default: int | None = None,
) -> DataFrame:
    """Batch twin: run-length via lag + cumulative sum; one row per run
    that reaches its trigger (same output contract). The trigger table
    defaults to the registry's sensor thresholds
    (MyDatacollector.py:211); callers monitoring non-sensor fields pass
    their own."""
    triggers = STATIC_TRIGGERS if triggers is None else triggers
    trig = F.lit(STATIC_TRIGGER_DEFAULT if default is None else default)
    for fname, t in triggers.items():
        trig = F.when(F.col("field") == fname, F.lit(t)).otherwise(trig)
    w = Window.partitionBy("kit_id", "field").orderBy("ts")
    runs = (
        fact.withColumn("prev", F.lag("value").over(w))
        # null-safe: a NULL value (or a NULL predecessor) starts a new run,
        # matching the streaming handler — plain `prev != value` yields
        # NULL for NULL operands and would silently continue the run
        .withColumn(
            "new_run",
            F.when(
                F.col("value").isNull() | ~F.col("prev").eqNullSafe(F.col("value")), 1
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("run_len", F.row_number().over(Window.partitionBy("kit_id", "field", "run_id").orderBy("ts")))
        .withColumn("trigger", trig)
    )
    return runs.where(F.col("run_len") == F.col("trigger")).select(
        "kit_id", "field", "ts", "value", F.col("run_len").cast("int").alias("run_len")
    )


_THROTTLE_OUT = StructType(
    [
        StructField("kit_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("accepted", BooleanType()),
        StructField("est_interval", DoubleType()),
        StructField("count", LongType()),
    ]
)
# Version 2: last_epoch / penalty_until hold integer MICROSECONDS (in a
# double — micros < 2^53 round-trip exactly); version 1 held float
# SECONDS in the same 4-field schema, so a v1 checkpoint restarted under
# v2 code would silently misread seconds as micros (first delta caps
# out; an active 4 h penalty expires instantly). The `ver` field makes
# the unit change structural: Spark's state-schema compatibility check
# rejects a 4-field v1 checkpoint outright, and the in-handler assert
# below catches any future unit change that keeps the arity.
_THROTTLE_STATE_VER = 2
_THROTTLE_STATE = StructType(
    [
        StructField("ver", LongType()),
        StructField("count", LongType()),
        StructField("interval", DoubleType()),
        StructField("last_epoch", DoubleType()),
        StructField("penalty_until", DoubleType()),
    ]
)


def _throttle_step(
    e_us: int, count: int, interval: float, last_us: int | None, pen_us: int
) -> tuple[bool, int, float, int, int]:
    """One IsBehavingKit decision (MyDatacollector.py:937-970) in EXACT
    integer-microsecond time arithmetic — the single point of truth shared
    by the streaming handler (kit_throttle), the deterministic batch twin
    (kit_throttle_batch), and — via mirrored expressions — the DuckDB
    RECURSIVE-CTE oracle of the driver-graded `kit_throttle` query.
    Integer epochs (not float .timestamp()) so a delta of exactly 480 s
    compares identically in every engine; the only float is the running
    interval mean, whose expression text the oracle mirrors verbatim."""
    accepted = True
    if last_us is not None:
        delta_us = min(e_us - last_us, INTERVAL_CAP_S * 1_000_000)
        interval = (interval * count + delta_us / 1e6) / (count + 1)
        if e_us < pen_us:
            accepted = False
        elif (
            count >= THROTTLE_MIN_COUNT
            and delta_us < THROTTLE_RATE_S * 1_000_000
            and interval < float(THROTTLE_RATE_S)
        ):
            # >=, not >: 'after 3 records' means the 4th
            # fast record is already throttle-eligible
            accepted = False
            pen_us = e_us + THROTTLE_PENALTY_S * 1_000_000
    return accepted, count + 1, interval, e_us, pen_us


def kit_throttle(record_stream: DataFrame) -> DataFrame:
    """Streaming per-device rate limiter: running-average interval capped
    at 30 min; chatty kits (interval < 480 s after 3 records) are dropped
    and penalized for 4 h (IsBehavingKit semantics)."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (kit_id,) = key
        ver, count, interval, last_epoch, penalty_until = (
            state.get
            if state.exists
            else (_THROTTLE_STATE_VER, 0, float(INTERVAL_CAP_S), None, 0.0)
        )
        if ver != _THROTTLE_STATE_VER:
            raise ValueError(
                f"throttle state version {ver} != {_THROTTLE_STATE_VER}: "
                f"checkpoint written by incompatible code (state units "
                f"changed) — reset the checkpoint instead of misreading it"
            )
        # state holds epochs as DOUBLE; integer micros < 2^53 round-trip
        # exactly, so the int arithmetic in _throttle_step is preserved
        last_us = None if last_epoch is None else int(last_epoch)
        pen_us = int(penalty_until or 0.0)
        out: list[tuple] = []
        # whole-group sort (same Arrow-chunk rationale as the static
        # monitor above): a chatty kit flooding >10k rows per batch is
        # exactly the case this operator exists for
        chunks = [c for c in pdfs if len(c)]
        # stable sort (same duplicate-ts determinism contract as above)
        pdf = (
            pd.concat(chunks).sort_values("ts", kind="stable")
            if chunks
            else pd.DataFrame(columns=["ts"])
        )
        if len(pdf):
            for ts in pdf["ts"]:
                accepted, count, interval, last_us, pen_us = _throttle_step(
                    ts.value // 1000, count, interval, last_us, pen_us
                )
                out.append((kit_id, ts, accepted, float(interval), int(count)))
        state.update(
            (
                _THROTTLE_STATE_VER,
                count,
                interval,
                None if last_us is None else float(last_us),
                float(pen_us),
            )
        )
        yield pd.DataFrame(out, columns=[f.name for f in _THROTTLE_OUT.fields])

    return record_stream.groupBy("kit_id").applyInPandasWithState(
        fn, _THROTTLE_OUT, _THROTTLE_STATE, "append", GroupStateTimeout.NoTimeout
    )


def kit_throttle_batch(records: DataFrame) -> DataFrame:
    """Deterministic batch twin of kit_throttle over an archive: same
    _throttle_step per record, whole history per kit in one sequential
    pandas scan (the sanctioned path-dependent escape hatch — the penalty
    clock makes each decision depend on which EARLIER records were
    throttled, so no window function expresses it).

    `records` needs kit_id (string), ts (timestamp) and epoch_us (long) —
    epoch_us is separate so callers can run a compressed/synthetic clock
    (the graded fixture) while reporting the archive's real timestamps.

    Scale shape: one shuffle on kit_id (repartition — identical sharding
    to the streaming state store) with a partition-local sort on
    (kit_id, epoch_us), then ONE mapInPandas scan per partition over all
    of its kits: per-key applyInPandas pays ~5 ms of Arrow/pandas
    overhead per GROUP (measured: 5.4 s over 1 500 kits at sf0.1 vs ~1 s
    for the partition scan). The sort makes keys group-contiguous ACROSS
    Arrow batches, so the scan carries the per-key registers from batch
    to batch and never materializes the partition — task memory is one
    Arrow batch (maxRecordsPerBatch rows), not data/shuffle-partitions
    (a skewed partition under the old concat-everything form could OOM
    an executor). Per-kit history is bounded by the retention window,
    not the corpus. Duplicate (kit_id, epoch_us) rows would make
    within-tie order nondeterministic — the record stream's key
    contract."""
    import numpy as np

    def scan(batches):
        pk = None
        count, interval, last_us, pen_us = 0, float(INTERVAL_CAP_S), None, 0
        for pdf in batches:
            if not len(pdf):
                continue
            kits = pdf["kit_id"].to_numpy()
            eus = pdf["epoch_us"].to_numpy()
            acc = np.empty(len(pdf), dtype=bool)
            ivs = np.empty(len(pdf), dtype=float)
            ns = np.empty(len(pdf), dtype=np.int64)
            for i in range(len(pdf)):
                if kits[i] != pk:
                    pk = kits[i]
                    count, interval, last_us, pen_us = 0, float(INTERVAL_CAP_S), None, 0
                accepted, count, interval, last_us, pen_us = _throttle_step(
                    int(eus[i]), count, interval, last_us, pen_us
                )
                acc[i] = accepted
                ivs[i] = interval
                ns[i] = count
            out = pdf.copy()
            out["accepted"] = acc
            out["est_interval"] = ivs
            out["count"] = ns
            yield out[["kit_id", "ts", "accepted", "est_interval", "count"]]

    return (
        records.repartition("kit_id")
        .sortWithinPartitions("kit_id", "epoch_us")
        .mapInPandas(scan, _THROTTLE_OUT)
    )


def dead_kit_report(fact: DataFrame, behind_s: int = 7200) -> DataFrame:
    """Liveness report (DeadKits, MyDatacollector.py:720-757): periodic
    batch query over the archive/state — per-kit last-seen vs fleet max."""
    last = fact.groupBy("kit_id").agg(F.max("ts").alias("last_seen"))
    fleet = last.agg(F.max("last_seen").alias("fleet_max"))
    return (
        last.crossJoin(F.broadcast(fleet))
        .withColumn("behind_sec", F.expr("(unix_micros(fleet_max) - unix_micros(last_seen)) DIV 1000000"))
        .withColumn("dead", F.col("behind_sec") > behind_s)
        .select("kit_id", "last_seen", "behind_sec", "dead")
    )
