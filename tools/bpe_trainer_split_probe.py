"""Single-process BPE trainer economics (r15, VERDICT #5): the r14
sweep measured the DISTRIBUTED merge loop at a flat ~0.2-0.26 s/merge
of driver-side barrier scheduling (SCALING.md r14 table) and named the
fix — distributed word counts, in-driver merge loop, distributed
apply. `text.bpe_train_driver` is that split; this probe measures what
it actually costs at the same sweep points so SCALING.md can carry the
before/after rather than a claim.

Method: per merge count, time bpe_train_driver end-to-end (the
distributed word-count collect + the pure-Python merge loop + the
merge-table createDataFrame/collect), and separately time just the
in-driver merge loop over the already-collected vocabulary — the
marginal per-merge cost that replaces the distributed loop's
~0.2 s/merge scheduling floor. Merges may EXHAUST on a capped
vocabulary (the sf0.01 synthetic runs dry at ~106 real merges); the
driver trainer STOPS there (termination twin of the distributed
chain's no-op rounds), so emitted-merge counts are reported alongside.

Usage: python tools/bpe_trainer_split_probe.py [sf_dir] [out_json]
           [--rounds 8,64,256]
Defaults: /root/testdata/sf0.01, /tmp/bpe_trainer_split_probe.json
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
    out_path = args[1] if len(args) > 1 else "/tmp/bpe_trainer_split_probe.json"
    rounds = [8, 64, 256]
    if "--rounds" in sys.argv:
        rounds = [int(x) for x in sys.argv[sys.argv.index("--rounds") + 1].split(",")]

    from mysense_spark.io import load
    from mysense_spark.operators.text import _bpe_chain, bpe_train_driver
    from mysense_spark.session import get_spark

    spark = get_spark("bpe-trainer-split-probe")
    doc = load(spark, sf_dir, "documents")
    doc.count()  # warm the scan so point 1 doesn't carry session startup

    # the distributed stage of the split, measured once (it is shared
    # by every merge count): ONE corpus scan -> capped vocabulary
    t0 = time.monotonic()
    vocab_rows = _bpe_chain(doc, n_merges=0)[0].collect()
    counts_sec = time.monotonic() - t0

    results = []
    for k in rounds:
        t0 = time.monotonic()
        merges = bpe_train_driver(spark, doc, k).collect()
        wall = time.monotonic() - t0

        # isolate the pure merge loop on the already-collected vocab
        seqs = [(r["seq"], int(r["cnt"])) for r in vocab_rows]
        t0 = time.monotonic()
        emitted = 0
        for step in range(1, k + 1):
            pair_counts: dict = {}
            for seq, cnt in seqs:
                toks = seq.strip().split("  ")
                for a, b in zip(toks, toks[1:]):
                    pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
            if not pair_counts:
                break
            (lhs, rhs), _pc = min(
                pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            emitted += 1
            needle, repl = f" {lhs}  {rhs} ", f" {lhs}{rhs} "
            seqs = [(seq.replace(needle, repl), cnt) for seq, cnt in seqs]
        loop_sec = time.monotonic() - t0

        results.append(
            {
                "n_merges": k,
                "emitted": emitted,
                "wall_sec": round(wall, 3),
                "loop_sec": round(loop_sec, 4),
                "loop_ms_per_merge": round(1000.0 * loop_sec / max(emitted, 1), 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    out = {
        "sf_dir": sf_dir,
        "vocab_rows": len(vocab_rows),
        "distributed_counts_sec": round(counts_sec, 3),
        "points": results,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
