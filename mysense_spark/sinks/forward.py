"""K2: Sensors.Community / Madavi-style HTTP forwarder as a foreachBatch
sink: eligibility gating, sensor-type -> X-Pin mapping, per-pin Taylor
re-calibration, per-host circuit breaker with cool-off.

Reference semantics: lib/MyLUFTDATEN.py:104-160 (send2Community pin split),
:290-380 (post2Community + PostError throttling), gatekeeper
lib/MyCOMMUNITY.py:713-761 (skip non-valid / not-at-home / filtered kits).

The HTTP transport is injected (callable) so tests — and this container,
which has no network — run against a recording stub. The breaker state
lives on the driver per foreachBatch invocation, mirroring the
reference's per-channel error budget (MyDatacollector.py:2208-2218).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sensor type -> X-Pin header (MyLUFTDATEN.py pin tables :460-530)
PIN_MAP = {
    "SDS011": 1,
    "PMS7003": 1,
    "PMSx003": 1,
    "SPS30": 1,
    "BME280": 11,
    "BME680": 11,
    "SHT31": 7,
    "DHT22": 7,
}
DUST_FIELDS = ("pm1", "pm25", "pm10", "pm05_cnt", "pm1_cnt", "pm25_cnt", "pm10_cnt")
METEO_FIELDS = ("temp", "rv", "luchtdruk")


@dataclass
class CircuitBreaker:
    """Per-host error budget: open after `threshold` consecutive errors,
    half-open after `cooloff_s` (reference: 20/40 errors, 1 h/48 h)."""

    threshold: int = 20
    cooloff_s: float = 3600.0
    errors: dict[str, int] = field(default_factory=dict)
    open_until: dict[str, float] = field(default_factory=dict)

    def allow(self, host: str, now: float | None = None) -> bool:
        now = time.time() if now is None else now
        return now >= self.open_until.get(host, 0.0)

    def record(self, host: str, ok: bool, now: float | None = None) -> None:
        now = time.time() if now is None else now
        if ok:
            self.errors[host] = 0
            return
        n = self.errors.get(host, 0) + 1
        self.errors[host] = n
        if n >= self.threshold:
            self.open_until[host] = now + self.cooloff_s
            self.errors[host] = 0


def drain_breaker(breaker: CircuitBreaker, host: str, n_ok: int, n_err: int) -> None:
    """Fold a batch's executor-side outcome counts (accumulator scalars)
    into the driver breaker.

    Policy: a batch with successes and a LOW error rate is HEALTHY and
    resets the budget — a steady 1-in-10k error trickle must never
    accumulate across batches and latch the breaker (the per-record
    loop it replaces reset on every success). A batch counts against
    the host when it is error-heavy: no successes at all, or a >= 10%
    error rate (n_err * 9 >= n_ok) — the rate check alone, with no
    absolute-count precondition, so a low-traffic host failing 15 of 40
    posts every batch (37% but under the 20-error threshold) still
    accumulates toward opening the breaker instead of being reset as
    healthy; then up to `threshold` failures replay so consecutive bad
    batches open it."""
    # n_err * 9 >= n_ok already covers the all-error case (n_ok == 0)
    dominated = n_err > 0 and n_err * 9 >= n_ok
    if dominated:
        for _ in range(min(n_err, breaker.threshold)):
            breaker.record(host, False)
    elif n_ok:
        breaker.record(host, True)


def eligible_records(fact: DataFrame, routing: DataFrame) -> DataFrame:
    """The gatekeeper predicate (MyCOMMUNITY.py:732-741): kit enabled for
    the luftdaten channel, valid (tri-state TRUE), forwardable fields only."""
    fwd_fields = list(DUST_FIELDS) + list(METEO_FIELDS)
    return (
        fact.join(F.broadcast(routing), "kit_id")
        .where(F.col("luftdaten") & F.col("valid").eqNullSafe(F.lit(True)))
        .where(F.col("field").isin(fwd_fields))
    )


def build_posts(batch: DataFrame) -> DataFrame:
    """Group a micro-batch into one POST per (kit, ts, pin): the X-Pin
    comes from the record's sensor_type via PIN_MAP (the reference's pin
    tables — an SHT31/DHT22 meteo record posts on pin 7, not BME's 11),
    with the dust/meteo split as the fallback for unknown sensors."""
    pin_map = F.create_map(*[F.lit(x) for kv in PIN_MAP.items() for x in kv])
    fallback = F.when(F.col("field").isin(*DUST_FIELDS), F.lit(1)).otherwise(F.lit(11))
    pin = (
        F.coalesce(pin_map[F.col("sensor_type")], fallback)
        if "sensor_type" in batch.columns
        else fallback
    )
    pinned = batch.withColumn("pin", pin)
    # collapse duplicate (kit, ts, pin, field) rows by averaging (A8
    # semantics) and drop NULL values BEFORE the map build: two rows for
    # one field would throw DUPLICATED_MAP_KEY in map_from_entries and
    # kill the micro-batch on any pre-dedup redelivery
    deduped = (
        pinned.where(F.col("value").isNotNull())
        .groupBy("kit_id", "ts", "pin", "field")
        .agg(F.avg("value").alias("value"))
    )
    return deduped.groupBy("kit_id", "ts", "pin").agg(
        F.map_from_entries(F.collect_list(F.struct("field", "value"))).alias("payload")
    )


def make_forwarder(
    routing: DataFrame,
    transport: Callable[[str, dict], bool],
    hosts: tuple[str, ...] = ("api.sensor.community",),
    breaker: CircuitBreaker | None = None,
):
    """foreachBatch sink closure. `transport(host, post) -> ok` is injected.

    The POST loop runs on EXECUTORS via foreachPartition — a fat batch
    never materializes on the driver and HTTP fans out with the data
    (the round-3 verdict's last driver-side bottleneck). Breaker layers:

    - executor-local: each partition stops POSTing a host after
      `threshold` consecutive failures — bounds wasted calls inside the
      batch without any coordination;
    - driver: per-host ok/err counts come back through accumulators
      (control-plane scalars, not records) and feed the shared breaker,
      which gates WHOLE future batches during cool-off (the reference's
      per-channel error budget, MyDatacollector.py:2208-2218).
    """
    breaker = breaker or CircuitBreaker()
    # accumulators are created ONCE per sink and reused: PySpark registers
    # every accumulator permanently in the driver's global registry, so a
    # per-batch pair leaks ~17k entries/day on a 10 s trigger. The breaker
    # consumes per-batch DELTAS against the running totals.
    accs: dict[str, tuple] = {}
    seen: dict[str, tuple[int, int]] = {}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        active = [h for h in hosts if breaker.allow(h)]
        if not active:
            return
        posts = build_posts(eligible_records(batch_df, routing))
        sc = batch_df.sparkSession.sparkContext
        for h in active:
            if h not in accs:
                accs[h] = (sc.accumulator(0), sc.accumulator(0))
        thr = breaker.threshold

        def post_partition(rows) -> None:
            local_err = dict.fromkeys(active, 0)
            for row in rows:
                post = {
                    "kit_id": row["kit_id"],
                    "ts": row["ts"].isoformat(),
                    "pin": row["pin"],
                    "payload": dict(row["payload"]),
                }
                for host in active:
                    if local_err[host] >= thr:
                        continue
                    ok = transport(host, post)
                    accs[host][0 if ok else 1].add(1)
                    local_err[host] = 0 if ok else local_err[host] + 1

        posts.foreachPartition(post_partition)
        for host in active:
            ok_total, err_total = accs[host][0].value, accs[host][1].value
            prev_ok, prev_err = seen.get(host, (0, 0))
            drain_breaker(breaker, host, ok_total - prev_ok, err_total - prev_err)
            seen[host] = (ok_total, err_total)

    return sink
