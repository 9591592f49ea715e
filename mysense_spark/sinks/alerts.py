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
    on *emitted* alarms); keys are small (kit x event), so a per-key
    applyInPandas does it distributed."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("kit_id", StringType()),
            StructField("event", StringType()),
            StructField("ts", TimestampType()),
            StructField("emitted", BooleanType()),
        ]
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        out = []
        last_emit = None
        for ts in pdf["ts"]:
            emit = last_emit is None or (ts - last_emit).total_seconds() >= suppress_s
            if emit:
                last_emit = ts
            out.append(emit)
        return pd.DataFrame(
            {"kit_id": pdf["kit_id"], "event": pdf["event"], "ts": pdf["ts"], "emitted": out}
        )

    return alarms.groupBy("kit_id", "event").applyInPandas(scan, schema)
