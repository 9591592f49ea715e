"""Streaming corpus ingestion: the document-side twin of the sensor
pipeline. A crawl drops JSONL files (doc_id, ts, text, lang, source)
into a directory; the stream normalizes, fingerprints, quality-gates,
and near-real-time DEDUPES the feed before appending to the corpus
archive — so downstream batch jobs (dedup/LSH/packing) start from a
feed that is already exact-duplicate-free within the dedup horizon.

One transform chain serves batch and streaming (the pipeline.py
pattern): `curate()` is a pure DataFrame transform; only the
duplicate-drop differs (state + watermark in streaming,
groupBy-min in batch).

Scale notes:
- fingerprint dedup state is bounded by the watermark horizon
  (dropDuplicatesWithinWatermark) — unbounded dropDuplicates state
  would OOM a year-long stream.
- every expression is JVM-side; the stream is a pure map + one
  stateful dedup, so it scales with input partitions (= files per
  micro-batch, or Kafka partitions behind the same chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id bigint, ts timestamp, text string, lang string, source string"

_MIN_TOKENS = 10  # streaming quality floor (gate fires on fragment docs)


def curate(docs: DataFrame) -> DataFrame:
    """Normalize + fingerprint + quality verdict. Pure transform —
    identical semantics in batch and streaming."""
    # explicit whitespace class (Java \s includes \x0B, RE2 does not —
    # keep the fingerprint identical to the batch dedup family's rule)
    norm = F.trim(F.regexp_replace(F.lower("text"), r"[ \t\n\r\f\x0B]+", " "))
    # tokenize the LOWERCASED text: counting [a-z0-9] runs on the raw
    # text scored every all-caps document as 0 tokens and silently
    # dropped it as 'too_short' — real crawl content is mixed-case
    n_tokens = F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
    verdict = (
        F.when(F.col("text").isNull() | (F.length(F.trim("text")) == 0), "drop:empty")
        .when(n_tokens < _MIN_TOKENS, "drop:too_short")
        .otherwise("keep")
    )
    return docs.select(
        "doc_id",
        "ts",
        "text",
        "lang",
        "source",
        F.md5(norm).alias("fingerprint"),
        n_tokens.alias("n_tokens"),
        verdict.alias("verdict"),
    )


def corpus_stream(spark: SparkSession, in_dir: str, watermark: str = "1 hour") -> DataFrame:
    """readStream over a JSONL drop directory -> curated, deduplicated
    document stream (kept docs only; the dropped side is observable via
    the verdict column before the filter in corpus_batch)."""
    raw = spark.readStream.schema(DOC_SCHEMA).json(in_dir)
    return (
        curate(raw)
        .where(F.col("verdict") == "keep")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def run_corpus_stream(
    spark: SparkSession, in_dir: str, checkpoint: str, out_dir: str, watermark: str = "1 hour"
):
    """Drive the stream to a parquet corpus archive; returns the query
    (availableNow so tests and replays drain the directory and stop)."""
    return (
        corpus_stream(spark, in_dir, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def corpus_batch(spark: SparkSession, in_dir: str) -> DataFrame:
    """Batch twin: same curate chain, duplicate-drop keeps the earliest
    (ts, doc_id) per fingerprint — the deterministic batch equivalent of
    the stream's first-seen-wins state."""
    from pyspark.sql import Window

    raw = spark.read.schema(DOC_SCHEMA).json(in_dir)
    w = Window.partitionBy("fingerprint").orderBy("ts", "doc_id")
    return (
        curate(raw)
        .where(F.col("verdict") == "keep")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# --- crawl-rate anomaly monitor (stateful) ---------------------------------

_RATE_OUT = "source string, ts timestamp, n_batch int, ema_rate double, anomaly boolean"
_RATE_STATE = "ema double, n_batches int"
_RATE_ALPHA = 0.3  # EMA smoothing
_RATE_SPIKE = 3.0  # batch flagged when > SPIKE x the running rate
_RATE_WARMUP = 3  # no anomaly verdicts until the EMA has seen this many batches


def crawl_rate_monitor(doc_stream):
    """Stateful per-source crawl-rate anomaly monitor — the corpus-side
    twin of the sensor pipeline's throttle/liveness state ops. Tracks an
    exponential moving average of documents-per-batch per source and
    flags batches that spike above 3x the running rate (a scraper loop,
    a spam flood, a duplicated feed) so the downstream mix isn't
    silently poisoned before the batch dedup runs.

    State per source is two numbers (EMA, batch count) — constant
    memory, no timeout needed; at 100 TB the cardinality of `source`
    bounds the state store, not the corpus.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (source,) = key
        ema, n_batches = state.get if state.exists else (0.0, 0)
        n = 0
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                t = pdf["ts"].max()
                last_ts = t if last_ts is None else max(last_ts, t)
        warmed = n_batches >= _RATE_WARMUP
        anomaly = bool(warmed and ema > 0 and n > _RATE_SPIKE * ema)
        # anomalous spikes do NOT pollute the running rate
        if not anomaly:
            ema = n if n_batches == 0 else (1 - _RATE_ALPHA) * ema + _RATE_ALPHA * n
            n_batches += 1
        state.update((float(ema), int(n_batches)))
        yield pd.DataFrame(
            [(source, last_ts, n, float(ema), anomaly)],
            columns=["source", "ts", "n_batch", "ema_rate", "anomaly"],
        )

    return doc_stream.groupBy("source").applyInPandasWithState(
        fn, _RATE_OUT, _RATE_STATE, "append", GroupStateTimeout.NoTimeout
    )
