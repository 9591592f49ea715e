"""Synthesize scale-factor data beyond the driver-shipped sf0.1, for the
SCALING.md sweep (VERDICT r5 #2: show the dedup/ANN candidate-count and
runtime curves hold at 10x).

The generator mirrors the measured statistics of the driver's
/root/testdata tables (probed 2026-08-14):

- documents: 30-word uniform vocabulary, doc length ~ U[10, 100] words,
  20 sources (src0..src19), langs {en: 41%, de/es/fr/zh: ~15% each},
  ~2% of docs are near-copies of an earlier doc (identical prefix, a few
  tail-token edits — the planted near-dup structure the LSH queries
  find), ~0.5% carry the rare 'dup' marker token.
- embeddings: 64-dim float32, unit-normalized gaussian, weak label
  structure (10 labels, centroid norm ~0.07).
- events: 10k rows and 150 users per 0.01 sf-unit (1M rows / 15k users
  at sf1.0), one month of timestamps, 5 uniform event types,
  value ~ U[0, 560], props {"k": int}.

Synthesized data is used ONLY for scaling measurements (timings and
candidate counts), never for correctness grading — the driver's own
parquet remains the oracle input.

Usage: python tools/gen_scale_data.py <out_dir> <sf>   # e.g. /tmp/scale/sf1.0 1.0
"""

from __future__ import annotations

import json
import sys

import numpy as np
import pandas as pd

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream", "value",
    "data", "small", "join", "filter", "big", "group", "hash", "customer",
    "sort", "order", "slow", "line", "part", "fast", "row", "the", "agg",
    "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def gen_documents(rng: np.random.Generator, n: int) -> pd.DataFrame:
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.02:
            # near-copy of a random earlier doc: identical prefix, edits
            # in the tail (the planted LSH-findable structure)
            w = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(int(rng.integers(1, 8))):
                w[int(rng.integers(max(len(w) - 12, 0), len(w)))] = VOCAB[int(rng.integers(0, 30))]
            texts.append(" ".join(w))
            continue
        ln = int(rng.integers(10, 101))
        w = [VOCAB[int(j)] for j in rng.integers(0, 30, size=ln)]
        if rng.random() < 0.005:
            w[int(rng.integers(0, ln))] = "dup"
        texts.append(" ".join(w))
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(LANGS, size=n, p=LANG_P),
            "source": [f"src{int(j)}" for j in rng.integers(0, 20, size=n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pd.DataFrame:
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    centroids = rng.normal(0, 0.07 / 8, size=(10, 64))  # centroid norm ~0.07
    x = rng.normal(0, 0.125, size=(n, 64)) + centroids[labels]
    x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(x),
            "label": labels,
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pd.DataFrame:
    base = pd.Timestamp("2024-01-01")
    ts = base + pd.to_timedelta(
        np.sort(rng.uniform(0, 30 * 86400, size=n)), unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "event_type": rng.choice(["click", "error", "purchase", "signup", "view"], size=n),
            "value": np.round(rng.uniform(0, 560, size=n), 2),
            "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)],
        }
    )


def main() -> None:
    out_dir, sf = sys.argv[1], float(sys.argv[2])
    import os

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260814)
    # driver scaling: docs 5000 and embeddings 2000 at sf0.1
    gen_documents(rng, int(50000 * sf)).to_parquet(f"{out_dir}/documents.parquet")
    gen_embeddings(rng, int(20000 * sf)).to_parquet(f"{out_dir}/embeddings.parquet")
    gen_events(rng, int(1_000_000 * sf), int(15000 * sf)).to_parquet(f"{out_dir}/events.parquet")
    print(f"wrote documents/embeddings/events at sf={sf} to {out_dir}")


if __name__ == "__main__":
    main()
