"""Query-scoped cache hygiene.

Several queries persist an intermediate that is consumed more than once
within the query (a shingle table feeding both a sizes agg and a
self-join; a k-means point set feeding two Lloyd passes; BM25's one
tokenize pass feeding the scalar stats and the scores). Those persists
are load-bearing for the query's own plan — but a DataFrame returned to
the caller is collected *after* the builder returns, so the builder
cannot unpersist before returning without forfeiting the reuse.

The resolution: builders register every persist here via
`tracked_persist`, and the query registry releases ALL tracked caches at
the entry of the NEXT query. Live cached storage is therefore bounded by
one query's working set in any sweep — the driver's 50-query gate, the
full bench, a 200-test pytest session — instead of accumulating until
the JVM dies (the round-4 full-suite failure mode that previously
required one-process-per-leg session hygiene).

localCheckpoint() blocks are deliberately NOT tracked: their RDDs are
freed by the ContextCleaner once the DataFrame is garbage-collected, and
holding a reference here would prevent exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_OWNER: str | None = None


def begin_query(name: str) -> None:
    """Called by the registry wrapper at query entry. Releases ALL
    tracked caches — including when the SAME query re-enters. The
    previous same-owner exemption let the bench's best-of-2 second
    repetition serve every pure-parquet-lineage persist from the
    CacheManager (the re-built plan matches the live InMemoryRelation),
    so min() reported a warm-cache time instead of a computation from
    the parquet inputs — the exact mechanism adjudicated as gaming for
    the kmeans directory cache and reverted in b891584. Every query
    invocation now starts cache-cold; persists still live through the
    invocation's own collect (released at the NEXT entry), which is all
    the within-query reuse they exist for."""
    global _OWNER
    release_tracked()
    _OWNER = name


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() that the query registry will release when a different
    query next enters."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame (idempotent; survives dead
    sessions). Returns the number released."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return n
