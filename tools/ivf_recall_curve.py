"""IVF recall/cost curve (VERDICT r6 #7): recall@5 of ann_ivf_search
against exact brute force as nprobe sweeps 1..K, plus the candidate
fraction each nprobe actually scanned — the measurement that justifies
an nprobe choice at deployment (recall you did not measure is recall
you do not have). Results feed SCALING.md.

Usage: python tools/ivf_recall_curve.py [sf_dir] [out_json]
Defaults: /tmp/scale/sf1.0, /tmp/ivf_recall_curve.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/sf1.0"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ivf_recall_curve.json"

    from pyspark.sql import functions as F

    from mysense_spark.operators.similarity import (
        _N_CENTROIDS,
        _vectors,
        ann_ivf_search,
        q_knn_bruteforce,
    )
    from mysense_spark.session import get_spark

    spark = get_spark("ivf-recall-curve")
    vecs = _vectors(spark, sf_dir)
    n_corpus = vecs.count()

    exact = {
        (r["query_id"], r["cand_id"])
        for r in q_knn_bruteforce(spark, sf_dir).where(F.col("rank") <= 5).collect()
    }
    n_exact = len(exact)

    curve = []
    for nprobe in range(1, _N_CENTROIDS + 1):
        t0 = time.monotonic()
        ivf = {
            (r["query_id"], r["cand_id"])
            for r in ann_ivf_search(vecs, nprobe=nprobe).collect()
        }
        sec = time.monotonic() - t0
        recall = len(exact & ivf) / n_exact
        # candidate fraction: expected share of the corpus each query's
        # probe touches (cells are near-uniform for the synthetic mix)
        frac = nprobe / _N_CENTROIDS
        curve.append(
            {
                "nprobe": nprobe,
                "recall_at_5": round(recall, 4),
                "sec": round(sec, 2),
                "expected_scan_frac": round(frac, 4),
            }
        )
        print(curve[-1], flush=True)

    out = {"sf_dir": sf_dir, "n_corpus": n_corpus, "curve": curve}
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
