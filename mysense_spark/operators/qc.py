"""Batch QC suite — the Spark rebuild of statistics/grubbs.py and
scripts/FilterShow.py: range validation, tri-state validity, in-repair
invalidation, PM-mass fill, one-pass z-score outliers, and the iterative
Grubbs test as an applyInPandas UDAF.

Mapping onto the driver tables: events.value is treated as the measurement,
events.event_type as the field, events.user_id as the kit.

Scale notes: all row-level validation is pure column expressions (whole-
stage codegen, no Python). Grubbs is inherently iterative per window —
parallelized across (kit, window) groups via applyInPandas; window size is
bounded (reference uses half-overlapping windows, ≥15 values), so each
pandas group is small no matter the total data volume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..io import load
from ..registry import GRUBBS_ALPHA, GRUBBS_MIN_VALUES, PM_MASS_FILL
from ._tdist import t_ppf
from .util import exact_avg, exact_std, sql_avg, sql_std


def q_range_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P5: per-field [lo, hi) bounds check (ValidValue,
    MyDatacollector.py:760-812): out-of-range values are NULLed and counted
    invalid; per-field valid/invalid summary like LogInvalids (:1554-1567)."""
    ev = load(spark, sf_dir, "events")
    lo, hi = 0.0, 100.0
    valid = F.col("value").between(lo, hi - 1e-9)
    vv = F.when(valid, F.col("value"))
    return (
        ev.withColumn("valid", valid)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("valid"), 1)).alias("n_valid"),
            F.count(F.when(~F.col("valid"), 1)).alias("n_invalid"),
            exact_avg(vv, 6).alias("avg_valid_value"),
        )
        .orderBy("event_type")
    )


SQL_RANGE_VALIDATE = f"""
SELECT event_type,
       count(*) AS n,
       count(CASE WHEN value BETWEEN 0.0 AND 99.999999999 THEN 1 END) AS n_valid,
       count(CASE WHEN NOT (value BETWEEN 0.0 AND 99.999999999) THEN 1 END) AS n_invalid,
       {sql_avg('CASE WHEN value BETWEEN 0.0 AND 99.999999999 THEN value END', 6)} AS avg_valid_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_tristate_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 + tri-state validity (lib/MyARCHIVE.py:190-194): valid TRUE in
    range, FALSE out of range, NULL while in repair. Repair registry:
    kits with user_id % 10 == 0 went into repair 2024-01-15 (TTNtable.refresh
    semantics, FilterShow.py:400-417). NULL must survive aggregation as its
    own class — the reference's core data-quality invariant."""
    ev = load(spark, sf_dir, "events")
    in_repair = (F.col("user_id") % 10 == 0) & (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
    valid = F.when(in_repair, F.lit(None).cast("boolean")).otherwise(F.col("value") < 100.0)
    return (
        ev.withColumn("valid", valid)
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("valid"), 1)).alias("n_valid"),
            F.count(F.when(~F.col("valid"), 1)).alias("n_invalid"),
            F.count(F.when(F.col("valid").isNull(), 1)).alias("n_repair"),
        )
        .orderBy("user_id")
    )


SQL_TRISTATE_VALIDITY = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN user_id % 10 = 0 AND ts >= TIMESTAMP '2024-01-15'
              THEN NULL ELSE value < 100.0 END AS valid
  FROM events
)
SELECT user_id,
       count(CASE WHEN valid THEN 1 END) AS n_valid,
       count(CASE WHEN NOT valid THEN 1 END) AS n_invalid,
       count(CASE WHEN valid IS NULL THEN 1 END) AS n_repair
FROM flagged
GROUP BY user_id
ORDER BY user_id
"""


def q_pm_mass_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: PM-mass NULL fill (AdjustPM, FilterShow.py:386-397): mass NULL
    while particle count present -> fill 0.013. Simulated: mass reading is
    NULL when value >= 150 (LoRa NaN-sentinel artifact)."""
    ev = load(spark, sf_dir, "events")
    mass = F.when(F.col("value") < 150.0, F.col("value"))
    filled = F.coalesce(mass, F.lit(PM_MASS_FILL))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.when(mass.isNull(), 1)).alias("n_filled"),
            exact_avg(filled, 6).alias("avg_filled"),
        )
        .orderBy("event_type")
    )


SQL_PM_MASS_FILL = f"""
SELECT event_type,
       count(CASE WHEN value >= 150.0 THEN 1 END) AS n_filled,
       {sql_avg('coalesce(CASE WHEN value < 150.0 THEN value END, 0.013)', 6)} AS avg_filled
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 one-pass variant (Zscore, grubbs.py:459-491): flag rows with
    |value - mean| > 3*stddev within (event_type). Stats computed once per
    group (order-independent), broadcast back — two scans, no O(n^2)."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        exact_avg(F.col("value"), 6).alias("mean_v"), exact_std(F.col("value"), 6).alias("std_v")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(F.col("value") - F.col("mean_v")) > 3 * F.col("std_v"))
        .select("event_id", "event_type", F.round("value", 4).alias("value"),
                F.round((F.col("value") - F.col("mean_v")) / F.col("std_v"), 4).alias("z"))
        .orderBy("event_id")
    )


SQL_ZSCORE_OUTLIERS = f"""
WITH stats AS (
  SELECT event_type, {sql_avg('value', 6)} AS mean_v, {sql_std('value', 6)} AS std_v
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, round(value, 4) AS value,
       round((value - mean_v) / std_v, 4) AS z
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE abs(value - mean_v) > 3 * std_v
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Iterative Grubbs (A11/A12) — applyInPandas per (kit, window)
# ---------------------------------------------------------------------------

_GRUBBS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("win_start", LongType()),
        StructField("n_values", IntegerType()),
        StructField("n_outliers", IntegerType()),
        StructField("lo_bound", DoubleType()),
        StructField("hi_bound", DoubleType()),
        StructField("mean_after", DoubleType()),
        StructField("std_after", DoubleType()),
    ]
)


def grubbs_filter(values: np.ndarray, alpha: float = GRUBBS_ALPHA) -> np.ndarray:
    """Recursive two-sided Grubbs test (grubbs.py:760-828 semantics):
    repeatedly remove the most extreme value while
    max|z| > ((N-1)/sqrt(N)) * sqrt(t^2 / (N-2+t^2)), t = ppf(alpha/2N, N-2).
    Returns a boolean keep-mask. Deterministic: ties resolved by first index."""
    keep = np.ones(len(values), dtype=bool)
    while keep.sum() > 2:
        v = values[keep]
        n = len(v)
        mean, std = v.mean(), v.std(ddof=1)
        if std == 0.0:
            break
        z = np.abs(v - mean) / std
        imax = int(np.argmax(z))
        t = t_ppf(alpha / (2 * n), n - 2)
        crit = (n - 1) / np.sqrt(n) * np.sqrt(t * t / (n - 2 + t * t))
        if z[imax] <= crit:
            break
        keep_idx = np.flatnonzero(keep)
        keep[keep_idx[imax]] = False
    return keep


def q_grubbs_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11+A12: recursive Grubbs outlier removal per (kit, weekly window)
    on the 'error' series, windows with >= GRUBBS_MIN_VALUES values
    (grubbs.py:889-918 FindOutliers; the reference sizes windows so each
    holds >= 15 samples). Non-SQL-expressible (iterative); verified in
    tests/ against a pure-python reference implementation.

    applyInPandas groups are (kit, window) — bounded size, arbitrary
    parallelism; window width is chosen so groups clear the 15-value
    minimum at the observed device rate (too-narrow windows degenerate
    into pure per-group overhead with zero output). Here: one 35-day
    window per kit over all fields (~66 samples/kit at every SF)."""
    ev = load(spark, sf_dir, "events")
    window_s = 35 * 86400
    win = (F.expr("unix_micros(ts) DIV 1000000") / window_s).cast("long") * window_s
    ev = ev.withColumn("win_start", win)

    empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "win_start": pd.Series(dtype="int64"),
            "n_values": pd.Series(dtype="int32"),
            "n_outliers": pd.Series(dtype="int32"),
            "lo_bound": pd.Series(dtype="float64"),
            "hi_bound": pd.Series(dtype="float64"),
            "mean_after": pd.Series(dtype="float64"),
            "std_after": pd.Series(dtype="float64"),
        }
    )

    def run_partition(batches):
        # mapInPandas over key-repartitioned data instead of applyInPandas:
        # thousands of tiny groups pay ~2-3ms Arrow framing each under
        # applyInPandas; one concat + vectorized pandas groupby per
        # partition amortizes it. Groups are whole per partition because
        # we repartition on the full key below.
        parts = [p for p in batches if len(p)]
        if not parts:
            yield empty
            return
        pdf = pd.concat(parts, ignore_index=True)
        rows = []
        for (uid, win), g in pdf.groupby(["user_id", "win_start"], sort=False):
            vals = g.sort_values("event_id")["value"].to_numpy(dtype=np.float64)
            if len(vals) < GRUBBS_MIN_VALUES:
                continue
            keep = grubbs_filter(vals)
            kept = vals[keep]
            rows.append(
                (
                    int(uid),
                    int(win),
                    int(len(vals)),
                    int((~keep).sum()),
                    round(float(kept.min()), 6),
                    round(float(kept.max()), 6),
                    round(float(kept.mean()), 6),
                    round(float(kept.std(ddof=1)), 6),
                )
            )
        if not rows:
            yield empty
            return
        out = pd.DataFrame(rows, columns=[f.name for f in _GRUBBS_SCHEMA.fields])
        yield out.astype({"n_values": "int32", "n_outliers": "int32"})

    cols = ["user_id", "win_start", "event_id", "value"]
    return (
        ev.select(*cols)
        .repartition("user_id", "win_start")
        .mapInPandas(run_partition, schema=_GRUBBS_SCHEMA)
        .orderBy("user_id", "win_start")
    )


QUERIES: dict[str, tuple] = {
    "range_validate": (q_range_validate, SQL_RANGE_VALIDATE),
    "tristate_validity": (q_tristate_validity, SQL_TRISTATE_VALIDITY),
    "pm_mass_fill": (q_pm_mass_fill, SQL_PM_MASS_FILL),
    "zscore_outliers": (q_zscore_outliers, SQL_ZSCORE_OUTLIERS),
    "grubbs_outliers": (q_grubbs_outliers, None),
}
