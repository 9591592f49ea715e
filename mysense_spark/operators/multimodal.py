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


_EMBED_DIM = 8
_EMBED_A = [31, 37, 41, 43, 47, 53, 59, 61]
_EMBED_B = [7, 11, 13, 17, 19, 23, 29, 3]


def q_media_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media embedding extraction via mapInPandas — the 'CLIP-embed every
    blob' stage of a multimodal pipeline. The embedding kernel is the
    stub codec (deterministic arithmetic on blob length, SQL-reproducible
    so the Arrow plumbing is hash-verified); a real deployment swaps in a
    model forward pass without touching the Spark contract.

    Output is LONG format (doc_id, dim, val) rather than an array column
    — array outputs break the driver's canonicalizer (the round-1
    sensor_set_diff lesson), and long format feeds the posexplode-based
    similarity operators (cluster_stats, kmeans_train) directly.

    Scale shape: pure map stage (Arrow batches in, D rows per blob out),
    no shuffle before the presentation sort; at 100 TB this is the GPU
    batch-inference stage and the plumbing here — batch-shape
    independence, explode-shaped schema — is exactly what it needs.
    """
    blobs = _with_blob(spark, sf_dir)

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(bytes(payload))
                for d in range(_EMBED_DIM):
                    rows.append(
                        (int(doc_id), d, round(((n * _EMBED_A[d] + _EMBED_B[d]) % 997) / 997.0, 6))
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "dim", "val"])

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("dim", IntegerType()),
            StructField("val", DoubleType()),
        ]
    )
    return blobs.mapInPandas(embed, schema=schema).orderBy("doc_id", "dim")


def _sql_media_embed() -> str:
    a = ", ".join(str(x) for x in _EMBED_A)
    b = ", ".join(str(x) for x in _EMBED_B)
    return f"""
WITH blob AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
dims AS (SELECT unnest(range({_EMBED_DIM})) AS d),
coef AS (SELECT d, ([{a}])[d + 1] AS ca, ([{b}])[d + 1] AS cb FROM dims)
SELECT doc_id, CAST(d AS INTEGER) AS dim,
       round(((n * ca + cb) % 997) / 997.0, 6) AS val
FROM blob, coef
ORDER BY doc_id, dim
"""


SQL_MEDIA_EMBED = _sql_media_embed()


def q_modality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting by sniffed modality — the 'what is actually in
    my multimodal corpus' report a pipeline runs before budgeting decode
    compute. Modality comes from the magic-bytes tier (here the stub:
    blob length mod 3 stands in for the magic-number dispatch, which is
    the same single-expression shape a real sniffer compiles to).

    Scale shape: metadata-only — one scan, one small agg; no blob ever
    reaches Python, which is the point of the metadata tier.
    """
    from .util import exact_avg

    blobs = _with_blob(spark, sf_dir)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.length("payload") % 3 + 1).cast("int"),
    )
    return (
        blobs.select(modality.alias("modality"), F.length("payload").alias("n_bytes"))
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_bytes").alias("total_bytes"),
            exact_avg(F.col("n_bytes"), 4).alias("avg_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("modality")
    )


def _sql_modality_mix() -> str:
    from .util import sql_avg

    return f"""
WITH blob AS (
  SELECT (['image', 'audio', 'video'])[CAST(octet_length(encode(text)) % 3 AS INT) + 1] AS modality,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT modality, count(*) AS n_blobs,
       -- CAST: sum(BIGINT) is HUGEINT -> float64 in pandas; Spark emits int64
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       {sql_avg('n_bytes', 4)} AS avg_bytes,
       max(n_bytes) AS max_bytes
FROM blob
GROUP BY modality
ORDER BY modality
"""


SQL_MODALITY_MIX = _sql_modality_mix()


QUERIES: dict[str, tuple] = {
    "blob_metadata": (q_blob_metadata, SQL_BLOB_METADATA),
    "frame_sample": (q_frame_sample, SQL_FRAME_SAMPLE),
    "media_embed": (q_media_embed, SQL_MEDIA_EMBED),
    "modality_mix": (q_modality_mix, SQL_MODALITY_MIX),
}
