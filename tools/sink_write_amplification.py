"""Sink write-amplification measurement (VERDICT r7 #3): replay one
archive day as N micro-batches through upsert_parquet_partitioned and
measure bytes WRITTEN per batch vs the day's resting size, under the two
workload shapes that bracket reality:

- fleet: every kit reports in every batch (steady-state ingest — every
  file of the day intersects the batch, so file pruning cannot help and
  amplification is bounded only by the trigger-interval contract);
- late: each batch touches 1% of kits (late/corrected data — the
  file-level pruned merge should rewrite only the intersecting files);
- fleet_append_compact: the same fleet workload through the r8 append
  path (amplification 1 per batch) plus one day-close compact_days pass
  — the steady-state contract (≈2× total vs ≈batches/2× for
  merge-per-batch).

Prints one JSON line per scenario and a summary; feeds SCALING.md.

Usage: python tools/sink_write_amplification.py [out_json]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_KITS = 2000
N_BATCHES = 24  # one day replayed as hourly micro-batches
LATE_FRAC = 0.01


def _tree_files(path: str) -> dict[str, int]:
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getsize(p)
    return out


def _bytes_written(before: dict[str, int], after: dict[str, int]) -> int:
    return sum(sz for p, sz in after.items() if p not in before)


def run_scenario(spark, name: str, kit_sel, mode: str = "merge") -> dict:
    from mysense_spark.sinks.upsert import (
        append_day_partitioned,
        compact_days,
        upsert_parquet_partitioned,
    )

    base_day = dt.datetime(2024, 1, 1)
    path = tempfile.mkdtemp(prefix=f"wamp_{name}_") + "/archive"
    written_per_batch = []
    for b in range(N_BATCHES):
        kits = kit_sel(b)
        rows = [
            (f"kit{k:05d}", base_day + dt.timedelta(hours=b, minutes=(k % 60)), "pm25", float(k + b), base_day)
            for k in kits
        ]
        batch = spark.createDataFrame(
            rows, "kit_id string, ts timestamp, field string, value double, ingest_ts timestamp"
        )
        before = _tree_files(path)
        if mode == "append":
            # file-per-batch append: the tuned shape for micro-batches (the
            # partitions knob models batch_bytes ~ file-size target; without
            # it 32 tiny files/batch make parquet footers dominate)
            append_day_partitioned(batch, path, partitions=1)
        else:
            upsert_parquet_partitioned(batch, path, keys=["kit_id", "ts", "field"], order_col="ingest_ts")
        after = _tree_files(path)
        written_per_batch.append(_bytes_written(before, after))
    if mode == "append":
        # the day-close pass: one rewrite of the appended day
        before = _tree_files(path)
        compact_days(spark, path, keys=["kit_id", "ts", "field"], order_col="ingest_ts")
        after = _tree_files(path)
        written_per_batch.append(_bytes_written(before, after))
    final = sum(_tree_files(path).values())
    total_written = sum(written_per_batch)
    res = {
        "scenario": name,
        "n_batches": N_BATCHES,
        "n_kits": N_KITS,
        "final_day_bytes": final,
        "total_bytes_written": total_written,
        "amplification": round(total_written / final, 2),
        "bytes_per_batch_mean": int(sum(written_per_batch) / len(written_per_batch)),
        "bytes_per_batch_last": written_per_batch[-1],
    }
    print(json.dumps(res), flush=True)
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return res


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sink_write_amplification.json"
    from mysense_spark.session import get_spark

    spark = get_spark("sink-write-amplification")
    spark.sparkContext.setLogLevel("ERROR")
    # At this synthetic scale AQE coalesces every day into ONE file and
    # file-level pruning has nothing to prune between; real days are
    # many-file. Pin coalescing off so the range-partitioned layout has
    # its deployment shape (shuffle-partition-count files per day).
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    fleet = run_scenario(spark, "fleet", lambda b: range(N_KITS))
    late = run_scenario(
        spark,
        "late",
        lambda b: (range(N_KITS) if b == 0 else
                   range((b * 37) % N_KITS, (b * 37) % N_KITS + int(N_KITS * LATE_FRAC))),
    )
    fleet_ac = run_scenario(
        spark, "fleet_append_compact", lambda b: range(N_KITS), mode="append"
    )
    with open(out_path, "w") as fh:
        json.dump({"fleet": fleet, "late": late, "fleet_append_compact": fleet_ac}, fh, indent=1)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
