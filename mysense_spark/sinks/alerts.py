"""K6: event notices with per-(kit, event) rate-limited suppression —
AlarmMessage semantics (MyDatacollector.py:972-988): a repeated alarm for
the same kit+event within the suppression window (6 h) is dropped.

Batch form: window over (kit_id, event) ordered by ts, keep rows whose
previous emitted alarm is older than the window. Implemented as a
session-style cumulative scan — deterministic and replayable; the
streaming form keys state by (kit_id, event) like streaming/state.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUPPRESS_S = 6 * 3600


def suppress_alarms(alarms: DataFrame, suppress_s: int = SUPPRESS_S) -> DataFrame:
    """Keep the first alarm of every burst: an alarm passes when no alarm
    for the same (kit_id, event) passed within the last `suppress_s`.

    Exact pass/drop needs a sequential scan per key (the gap resets only
    on *emitted* alarms). Shape: repartition on the key plus a
    partition-local sort on (kit_id, event, ts), then ONE mapInPandas
    scan per partition over all of its keys — a per-key applyInPandas
    measured ~5 ms of Arrow/pandas overhead PER GROUP (16 s for 3 000
    tiny groups at sf0.1); the per-partition scan pays that overhead
    once per Arrow batch. The sort makes keys group-contiguous ACROSS
    batches, so the scan carries (last_emit, armed) from batch to batch
    and never materializes the partition — task memory is one Arrow
    batch, not data/shuffle-partitions (the old concat-everything form
    could OOM on a large or skewed partition). Same shuffle (hash on
    the key), same sequential semantics; the scan compares exact int64
    nanoseconds, boundary-identical to the oracle's epoch_us
    arithmetic. Duplicate (kit, event, ts) rows would make the
    within-tie order nondeterministic — the alarm feed's key contract,
    as with the throttle twin."""
    import numpy as np

    s_ns = int(suppress_s) * 1_000_000_000

    def scan(batches):
        pk = pe = None
        last = 0
        have = False
        for pdf in batches:
            if not len(pdf):
                continue
            kit = pdf["kit_id"].to_numpy()
            ev = pdf["event"].to_numpy()
            ts_ns = pdf["ts"].astype("int64").to_numpy()
            emitted = np.empty(len(pdf), dtype=bool)
            for i in range(len(pdf)):
                if kit[i] != pk or ev[i] != pe:
                    pk, pe, have = kit[i], ev[i], False
                if not have or ts_ns[i] - last >= s_ns:
                    emitted[i] = True
                    last = ts_ns[i]
                    have = True
                else:
                    emitted[i] = False
            out = pdf.copy()
            out["emitted"] = emitted
            yield out[["kit_id", "event", "ts", "emitted"]]

    return (
        alarms.repartition("kit_id", "event")
        .sortWithinPartitions("kit_id", "event", "ts")
        .mapInPandas(scan, "kit_id string, event string, ts timestamp, emitted boolean")
    )
