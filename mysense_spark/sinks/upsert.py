"""K1: idempotent upsert sink — REPLACE-INTO-keyed-on-(kit, datum)
semantics (lib/MyARCHIVE.py:360-456) as a latest-row-wins merge.

Plain-parquet implementation (no Delta in this runtime): read existing,
union, window-dedup on the key, crash-safe directory swap. This form
rewrites the WHOLE dataset per merge — correct, but O(archive) I/O, so
it is the small-archive / test-runtime path only. At scale the contract
is a one-line Delta/Iceberg MERGE INTO (or, staying on plain parquet, a
day-partitioned layout — write_date_partitioned — where the merge
filters existing data to the days present in the batch and overwrites
only those partitions with dynamic partitionOverwriteMode); the
operator interface stays identical either way.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_parquet(new_df: DataFrame, path: str, keys: list[str], order_col: str) -> None:
    """Merge new_df into the parquet dataset at `path`, keeping the row
    with the greatest `order_col` per key (late/duplicate handling)."""
    spark = new_df.sparkSession
    if os.path.exists(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
        existing = spark.read.parquet(path)
        merged = existing.unionByName(new_df, allowMissingColumns=True)
    else:
        merged = new_df
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    deduped = merged.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")

    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    deduped.write.mode("overwrite").parquet(tmp)
    # crash-safe swap: move the OLD data aside before promoting the new
    # — the previous rmtree-then-rename left a window where a driver
    # crash lost the whole archive, and the checkpoint replay would then
    # rebuild it from the last micro-batch alone
    trash = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, trash)
    try:
        os.rename(tmp, path)
    except Exception:
        if os.path.exists(trash):  # roll the old data back
            os.rename(trash, path)
        raise
    if os.path.exists(trash):
        shutil.rmtree(trash)


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Archive layout for the 100 TB fact table: hive-partitioned by day
    (SURVEY §1.1 — the long fact table is date-partitioned so period
    queries prune partitions instead of scanning the corpus; the
    reference gets the same effect from per-period WHERE clauses against
    indexed MySQL, e.g. FilterShow.py:419-429 chunking).

    Day is derived, stored as a partition column; readers filtering on
    `day` (or on `ts` through it) touch only matching directories —
    verified by the partition-pruning test."""
    (
        df.withColumn("day", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
