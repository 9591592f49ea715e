"""SQ8 economics probe (r15): measures what the scalar-quantized scan
tier actually buys — recall@5 of the graded shape (top-48 shortlist +
exact re-rank) against exact brute force, the at-rest compression of
the codes layout vs the full-precision vectors, and the wall cost of
the approximate scan vs the exact scan at the same corpus size — so
SCALING.md states the SQ8 niche (the memory-bound full-scan tier
between brute force and IVF) from numbers.

Method: per corpus, (1) exact top-5 per query via q-side brute force;
(2) the graded SQ8 chain (params -> codes -> approximate cosine ->
top-48 shortlist -> fenced exact re-rank) timed end to end, recall@5 =
|SQ8 top-5 ∩ exact top-5| / 5 averaged over the 5 queries; (3) codes
and vectors written to parquet, on-disk bytes compared. Everything is
deterministic (integer grid arithmetic, no RNG), so reruns reproduce
the recall numbers bit-for-bit; timings are the usual noisy wall.

Usage: python tools/sq8_probe.py [sf_dir] [out_json]
Defaults: /tmp/scale/emb200k, /tmp/sq8_probe.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/tmp/scale/emb200k"
    out_path = args[1] if len(args) > 1 else "/tmp/sq8_probe.json"

    from pyspark.sql import functions as F

    from mysense_spark.operators.similarity import (
        _sq8_literals,
        _vectors,
        ann_sq8_search,
        knn_rerank,
        sq8_encode,
        sq8_params,
    )
    from mysense_spark.session import get_spark

    spark = get_spark("sq8-probe")
    vecs = _vectors(spark, sf_dir)
    n = vecs.count()

    # exact top-5 per query (the fenced re-rank kernel over the corpus)
    q = vecs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    c = vecs.select(
        F.col("vec_id").alias("cand_id"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    t0 = time.time()
    exact = {
        (r["query_id"], r["cand_id"])
        for r in knn_rerank(q, c, top_k=5).collect()
    }
    t_exact = time.time() - t0

    t0 = time.time()
    got = {
        (r["query_id"], r["cand_id"])
        for r in ann_sq8_search(vecs).collect()
    }
    t_sq8_cold = time.time() - t0
    recall = len(got & exact) / len(exact)

    # deployment split: train+encode+persist ONCE, then the warm scan
    # reads the persisted codes layout (the ensure_*_index shape)
    tmp = f"/tmp/sq8_probe_layout.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    t0 = time.time()
    params = sq8_params(vecs).orderBy("d").collect()
    mns, spans = _sq8_literals(params)
    sq8_encode(vecs, mns, spans).write.parquet(f"{tmp}/codes")
    t_encode = time.time() - t0
    codes_disk = spark.read.parquet(f"{tmp}/codes")
    t0 = time.time()
    warm = {
        (r["query_id"], r["cand_id"])
        for r in ann_sq8_search(vecs, parts=(params, codes_disk)).collect()
    }
    t_sq8_warm = time.time() - t0
    assert warm == got, "persisted-codes search diverged from inline"

    vecs.select("vec_id", "v").write.parquet(f"{tmp}/full")

    def _du(p: str) -> int:
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(p)
            for f in fs
        )

    bytes_codes, bytes_full = _du(f"{tmp}/codes"), _du(f"{tmp}/full")
    shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "recall_at_5": recall,
        "t_exact_sec": round(t_exact, 3),
        "t_sq8_cold_sec": round(t_sq8_cold, 3),
        "t_encode_sec": round(t_encode, 3),
        "t_sq8_warm_sec": round(t_sq8_warm, 3),
        "bytes_codes": bytes_codes,
        "bytes_full": bytes_full,
        "compression": round(bytes_full / bytes_codes, 2) if bytes_codes else None,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
