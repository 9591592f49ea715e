"""Shuffle-routed codebook tier at its engaging shape (VERDICT r10 #2).

The salted shuffle-routed assignment tier (`_nearest_routed_shuffle`)
engages naturally only above _TC_BCAST_K1 = 1e5 coarse cells
(N ≈ 4×10^8 vectors) — far beyond any local dataset — so until r11 its
evidence was row-identity pins only (bcast_k1=0 fixture), with zero
timing. This probe measures it directly:

- Forces the tier with bcast_k1=0 at three N a decade apart
  (sf0.1 = 2k, sf1.0 = 20k, and a 200k synthetic generated with
  gen_scale_data's embedding distribution), in BOTH route shapes:
  the default single route cell (K2=1 — the boundary shape the tier
  would first see) and a forced multi-cell routing
  (route_group ≈ K1/8, the steady-state shape at 8×10^9+ vectors).
- Times the default (broadcast/fused) tier at the same N for the
  tier-boundary cliff ratio.
- Records K1, K2, salt fan-out, and the derived per-task cell payload
  (route_group × 64 dims × 8 B int64 grid) plus the exchange
  replication cost (K2 × salts cell copies).
- Cross-checks row identity between tiers at every point (the pinned
  pytest does this at fixture scale; here it rides along at probe
  scale for free).

α between decades: log10(t_big/t_small) per 10× N step.

Usage: python tools/shuffle_tier_probe.py [out_json]
Needs /tmp/scale/sf1.0 (tools/gen_scale_data.py); writes the 200k
embeddings set to /tmp/scale/emb200k on first run.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1.0", "/tmp/scale/sf1.0"),
    ("emb200k", "/tmp/scale/emb200k"),
]


def ensure_200k() -> None:
    path = "/tmp/scale/emb200k/embeddings.parquet"
    if os.path.exists(path):
        return
    import numpy as np

    from tools.gen_scale_data import gen_embeddings

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(200_000)
    gen_embeddings(rng, 200_000).to_parquet(path, index=False)


def timed(fn, reps: int = 2) -> float:
    best = math.inf
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shuffle_tier_probe.json"
    ensure_200k()
    from mysense_spark.operators.similarity import (
        _vectors,
        trained_codebook,
        two_level_membership,
    )
    from mysense_spark.session import get_spark

    spark = get_spark()
    salts = spark.sparkContext.defaultParallelism
    results: dict[str, dict] = {"salts": salts}
    for name, sf_dir in POINTS:
        vecs = _vectors(spark, sf_dir).persist()
        n = vecs.count()
        coarse, _, _ = trained_codebook(vecs)
        k1 = coarse.count()
        # steady-state multi-cell routing: ~8 route cells at this K1
        rg_multi = max(2, k1 // 8)
        point: dict = {"n": n, "k1": k1, "route_group_multi": rg_multi}

        def assign_count(**kw) -> int:
            return two_level_membership(vecs, **kw).count()

        # four legs: the physical TIER flips within each routing shape;
        # the routing shape (default single-cell vs forced multi-cell)
        # changes the logical pruning, so identity is only claimed
        # tier-vs-tier at the SAME route_group
        point["default_sec"] = timed(lambda: assign_count())
        point["shuffle_k2_1_sec"] = timed(lambda: assign_count(bcast_k1=0))
        point["fused_multi_sec"] = timed(lambda: assign_count(route_group=rg_multi))
        point["shuffle_multi_sec"] = timed(
            lambda: assign_count(bcast_k1=0, route_group=rg_multi)
        )
        k2 = math.ceil(k1 / rg_multi)
        point["k2_multi"] = k2
        # per-task state: ONE cell array of ≈ rg_multi int64-grid vectors
        point["cell_payload_bytes"] = rg_multi * 64 * 8
        # exchange replication: every cell array ships `salts` ways
        point["salt_replication_bytes"] = k2 * salts * rg_multi * 64 * 8

        # row identity between PHYSICAL tiers at probe scale (the pinned
        # pytest's check, riding along at every N here) — same logical
        # routing, broadcast vs shuffle plan
        def identical(kw_a: dict, kw_b: dict) -> bool:
            a = two_level_membership(vecs, **kw_a).select("vec_id", "cent_id")
            b = two_level_membership(vecs, **kw_b).select("vec_id", "cent_id")
            return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

        point["tiers_identical_default_rg"] = identical({}, {"bcast_k1": 0})
        point["tiers_identical_multi_rg"] = identical(
            {"route_group": rg_multi}, {"route_group": rg_multi, "bcast_k1": 0}
        )
        vecs.unpersist()
        results[name] = point
        print(name, point, flush=True)

    for key in ("default_sec", "shuffle_k2_1_sec", "fused_multi_sec", "shuffle_multi_sec"):
        for small, big in (("sf0.1", "sf1.0"), ("sf1.0", "emb200k")):
            ts, tb = results[small][key], results[big][key]
            if ts > 0:
                results[f"alpha_{key}_{small}_to_{big}"] = round(
                    math.log10(tb / ts), 3
                )
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
