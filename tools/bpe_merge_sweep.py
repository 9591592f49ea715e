"""BPE merge-count boundary sweep (r14, VERDICT #5): the merge loop in
text._bpe_chain is driver-SEQUENTIAL — each round is a barrier group of
tiny jobs over the <= _BPE_VOCAB_CAP symbol table (pairs agg, 1-row
argmax checkpoint, broadcast replace checkpoint). The graded shape runs
8 rounds and measured alpha=0.00 vs corpus size; this tool answers the
production question that extrapolation can't: where does the DRIVER
LOOP start to dominate as the merge count grows toward a real 32k
vocabulary?

Method: time _bpe_chain(doc, n_merges) end-to-end (plus one final
symbol-table count to flush the last checkpoint) at each requested
merge count, same corpus, fresh lineage per point. The corpus scan
(word counts) happens once inside every point, so the MARGINAL
sec/merge between consecutive points isolates the pure driver-loop
cost: sec_per_merge = (t[k2] - t[k1]) / (k2 - k1). Note merges may
EXHAUST on a capped vocabulary before high counts — exhausted rounds
are left-join no-ops (text.py:1743), which is exactly the floor of the
per-round scheduling cost being measured.

Usage: python tools/bpe_merge_sweep.py [sf_dir] [out_json]
           [--rounds 8,64,256]
Defaults: /root/testdata/sf0.01, /tmp/bpe_merge_sweep.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_path = args[1] if len(args) > 1 else "/tmp/bpe_merge_sweep.json"
    rounds = [8, 64, 256]
    if "--rounds" in sys.argv:
        rounds = [int(x) for x in sys.argv[sys.argv.index("--rounds") + 1].split(",")]

    from mysense_spark.io import load
    from mysense_spark.operators.text import _bpe_chain
    from mysense_spark.session import get_spark

    spark = get_spark("bpe-merge-sweep")
    doc = load(spark, sf_dir, "documents")
    doc.count()  # warm the scan so point 1 doesn't carry session startup

    results = []
    for k in rounds:
        t0 = time.monotonic()
        w, merges = _bpe_chain(doc, n_merges=k)
        n_symbols = w.count()
        wall = time.monotonic() - t0
        n_real = sum(m.count() for m in merges)  # non-exhausted rounds
        row = {
            "n_merges": k,
            "wall_sec": round(wall, 2),
            "sec_per_merge_total": round(wall / k, 3),
            "n_real_merges": n_real,
            "vocab_rows": n_symbols,
        }
        results.append(row)
        print(row, flush=True)

    for i in range(1, len(results)):
        a, b = results[i - 1], results[i]
        b["sec_per_merge_marginal"] = round(
            (b["wall_sec"] - a["wall_sec"]) / (b["n_merges"] - a["n_merges"]), 3
        )
        print(
            f"marginal {a['n_merges']}->{b['n_merges']}: "
            f"{b['sec_per_merge_marginal']} s/merge",
            flush=True,
        )

    out = {"sf_dir": sf_dir, "rounds": results}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
