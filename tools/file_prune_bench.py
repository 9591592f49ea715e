"""Control-plane cost of file selection at a multi-thousand-file day
(VERDICT r8 #2 → r9): times `_select_files` with the promote-time
`_key_ranges.json` sidecar vs the legacy per-file parquet-footer loop.
The data plane is identical either way — this measures only the
driver-side selection step that runs once per (merge, touched day).

Builds a synthetic day directory of N small kit-ranged parquet files
with pyarrow (no Spark session needed), records the sidecar exactly as
a promote would (`_record_ranges`), and reports wall time + footer
reads for both paths. Results feed SCALING.md.

Usage: python tools/file_prune_bench.py [n_files] [out_json]
Defaults: 3000, /tmp/file_prune_bench.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/file_prune_bench.json"

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysense_spark.sinks import upsert as U

    day_dir = "/tmp/prune_bench/day=2024-01-01"
    shutil.rmtree("/tmp/prune_bench", ignore_errors=True)
    os.makedirs(day_dir)
    t0 = time.monotonic()
    for i in range(n_files):
        # each file covers a narrow contiguous kit range, like the
        # range-partitioned stage write produces
        kits = [f"kit{i * 4 + j:07d}" for j in range(4)]
        tbl = pa.table({"kit_id": kits, "value": [float(j) for j in range(4)]})
        pq.write_table(tbl, os.path.join(day_dir, f"part-{i:05d}.parquet"))
    t_build = time.monotonic() - t0

    batch_keys = [f"kit{i:07d}" for i in (3, 4001, 11503)]  # 3 sparse kits

    t0 = time.monotonic()
    rep_footer, keep_footer = U._select_files(day_dir, batch_keys, "kit_id")
    t_footer = time.monotonic() - t0

    t0 = time.monotonic()
    U._record_ranges(day_dir, "kit_id")  # what the promote would have done
    t_record = time.monotonic() - t0

    t0 = time.monotonic()
    rep_sidecar, keep_sidecar = U._select_files(day_dir, batch_keys, "kit_id")
    t_sidecar = time.monotonic() - t0

    assert (rep_footer, keep_footer) == (rep_sidecar, keep_sidecar), "selection drifted"
    result = {
        "n_files": n_files,
        "replace_files": len(rep_footer),
        "build_sec": round(t_build, 3),
        "footer_loop_sec": round(t_footer, 3),
        "record_sec": round(t_record, 3),
        "sidecar_sec": round(t_sidecar, 3),
        "speedup": round(t_footer / t_sidecar, 1) if t_sidecar > 0 else None,
    }
    print(json.dumps(result))
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    shutil.rmtree("/tmp/prune_bench", ignore_errors=True)


if __name__ == "__main__":
    main()
