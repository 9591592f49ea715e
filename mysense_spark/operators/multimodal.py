"""Multimodal column plumbing: opaque binary payloads with typed metadata,
decode / feature-extract / frame-sample as Arrow-batched Python stages.

The image/audio codec libraries are not in this container, so the decode
kernel is a clearly-marked deterministic stub — but the Spark-side
contract is real and tested: binary columns, metadata extraction as JVM
expressions, a mapInPandas stage with an explode-shaped output schema
(one row per sampled frame), and batch-size-independent results.

At 100 TB: binary payloads stay in parquet as BINARY; metadata predicates
(size, hash prefix) push down so the Python stage only sees selected
blobs; mapInPandas streams Arrow batches without materializing a
partition in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def decode_media(payload: bytes) -> dict:
    """STUB decode kernel. A real deployment plugs Pillow/ffmpeg here;
    this container has neither, so we derive deterministic fake media
    properties from the bytes themselves (keeps tests meaningful)."""
    if payload is None:
        raise NotImplementedError("real codec not available in this environment")
    n = len(payload)
    return {
        "n_frames": n % 5 + 1,
        "width": 16 * (n % 40 + 1),
        "height": 9 * (n % 40 + 1),
    }


def _with_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import load

    doc = load(spark, sf_dir, "documents")
    return doc.select("doc_id", F.col("text").cast("binary").alias("payload"))


def q_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column — byte length + content
    hash, all JVM-side (no decode needed): the predicate-pushdown tier of
    a multimodal pipeline."""
    blobs = _with_blob(spark, sf_dir)
    return (
        blobs.select(
            "doc_id",
            F.length("payload").alias("n_bytes"),
            F.sha2("payload", 256).alias("sha256"),
            F.substring(F.hex("payload"), 1, 16).alias("magic_hex"),
        )
        .orderBy("doc_id")
    )


SQL_BLOB_METADATA = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256,
       upper(substr(hex(encode(text)), 1, 16)) AS magic_hex
FROM documents
ORDER BY doc_id
"""


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_id", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", DoubleType()),
    ]
)


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling via mapInPandas: one input blob -> n_frames output
    rows (explode-shaped UDF), deterministic per blob and independent of
    Arrow batch boundaries. The 'feature' is the stub codec's output."""
    blobs = _with_blob(spark, sf_dir)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = decode_media(bytes(payload))
                n = len(bytes(payload))
                for f in range(meta["n_frames"]):
                    rows.append(
                        (
                            int(doc_id),
                            f,
                            meta["width"],
                            meta["height"],
                            round(((n * 31 + f * 17) % 997) / 997.0, 6),
                        )
                    )
            yield pd.DataFrame(rows, columns=[c.name for c in _FRAME_SCHEMA.fields])

    return blobs.mapInPandas(sample, schema=_FRAME_SCHEMA).orderBy("doc_id", "frame_id")


# the stub codec is pure arithmetic on byte length, so the oracle can
# reproduce it exactly in SQL — proving batch-shape independence
SQL_FRAME_SAMPLE = """
WITH meta AS (
  SELECT doc_id, octet_length(encode(text)) AS n,
         octet_length(encode(text)) % 5 + 1 AS n_frames,
         CAST(16 * (octet_length(encode(text)) % 40 + 1) AS INTEGER) AS width,
         CAST(9 * (octet_length(encode(text)) % 40 + 1) AS INTEGER) AS height
  FROM documents
)
SELECT doc_id, CAST(f AS INTEGER) AS frame_id, width, height,
       round(((n * 31 + f * 17) % 997) / 997.0, 6) AS feature
FROM meta, unnest(range(n_frames)) AS t(f)
ORDER BY doc_id, frame_id
"""


QUERIES: dict[str, tuple] = {
    "blob_metadata": (q_blob_metadata, SQL_BLOB_METADATA),
    "frame_sample": (q_frame_sample, SQL_FRAME_SAMPLE),
}
