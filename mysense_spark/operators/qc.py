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
       -- NULL-inclusive, matching the Spark side's mass.isNull() count
       -- AND the coalesce fill below: a NULL raw value IS a filled row
       -- (value >= 150 alone would silently diverge the moment the
       -- corpus gains a NULL value — FIXTURES.md allows them)
       count(CASE WHEN value IS NULL OR value >= 150.0 THEN 1 END) AS n_filled,
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
        StructField("n_rescued", IntegerType()),
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


# Half-overlap window driver (A12): width W stepping W/2, the reference's
# FindOutliers sizing (grubbs.py:889-918). Fixture: 3 kits x 140 samples,
# 6-hourly over 35 days; 14-day windows.
_GRUBBS_W_S = 14 * 86400
_GRUBBS_STEP_S = 21600
_GRUBBS_N_SAMPLES = 140
_GRUBBS_SPAN_S = _GRUBBS_N_SAMPLES * _GRUBBS_STEP_S


def _grubbs_window_starts(t0: int, t1: int, width: int) -> list[int]:
    """Window starts per the reference driver (grubbs.py:894-901): step
    width/2; stop within 10 h of the period end; the final start snaps to
    t1 - (width+1)//2 so the tail is covered by one half-width window."""
    half = width // 2
    starts: list[int] = []
    s = t0
    while s + 36000 <= t1:
        starts.append(s)
        s += half
        if t1 - 36000 < s < t1:
            s = t1 - (width + 1) // 2
    return starts


def _grubbs_fixture_rows() -> list[tuple]:
    """Deterministic series: smooth seasonal base + LCG noise + injected
    spikes at fixed indices. Pure integer arithmetic — identical on every
    platform, so the VALUES oracle below is frozen once."""
    import math

    rows = []
    for uid in (1, 2, 3):
        seed = uid * 12345 + 6789
        for i in range(_GRUBBS_N_SAMPLES):
            seed = (seed * 1103515245 + 12345) % (1 << 31)
            noise = (seed % 1000) / 1000.0 - 0.5
            base = 20.0 + 5.0 * math.sin(2.0 * math.pi * i / 28.0) + uid
            v = base + noise
            if i >= 100:
                # regime shift: values here are outliers in the window
                # that straddles the old regime but inliers in the later
                # window — exercises the overlap re-validation (rescue)
                v += 12.0
            if i % 37 == 17:
                v += 15.0 + uid  # high spike
            if i % 53 == 29:
                v -= 12.0  # low spike
            rows.append((uid, i * _GRUBBS_STEP_S, round(v, 3)))
    return rows


def q_grubbs_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11+A12: recursive Grubbs outlier removal under the reference's
    half-overlapping window driver (grubbs.py:889-918 FindOutliers):
    windows of width W step W/2; each window re-validates its overlap
    with the previous window (resetValid, grubbs.py:830-849) and then
    re-tests, so the LAST window covering a value decides its validity.
    n_rescued counts values a previous window had marked outlier that the
    later window re-validated — the observable effect of the overlap
    re-validation. (The reference's lossy-first-quarter reset only guards
    pre-existing DB validity flags during the initial blanket reset; a
    stateless batch has no pre-existing flags, so it is a no-op here.)

    Runs on a pinned deterministic fixture with a frozen VALUES oracle
    (the ttn_decode pattern) so the driver can hash-check the full
    iterative kernel. The same mapInPandas driver runs unchanged on any
    fact table: groups are (kit, macro-period) — bounded by period
    length, arbitrary kit-parallelism, one shuffle."""
    from ..io import values_df

    rows = _grubbs_fixture_rows()
    df = values_df(spark, rows, "user_id long, t long, value double").repartition(4, "user_id")

    empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "win_start": pd.Series(dtype="int64"),
            "n_values": pd.Series(dtype="int32"),
            "n_outliers": pd.Series(dtype="int32"),
            "n_rescued": pd.Series(dtype="int32"),
            "lo_bound": pd.Series(dtype="float64"),
            "hi_bound": pd.Series(dtype="float64"),
            "mean_after": pd.Series(dtype="float64"),
            "std_after": pd.Series(dtype="float64"),
        }
    )

    def run_partition(batches):
        # mapInPandas over key-repartitioned data (not applyInPandas):
        # per-group Arrow framing is ~2-3 ms, so tiny groups are pure
        # overhead; one concat + groupby per partition amortizes it.
        parts = [p for p in batches if len(p)]
        if not parts:
            yield empty
            return
        pdf = pd.concat(parts, ignore_index=True)
        out_rows = []
        for uid, g in pdf.groupby("user_id", sort=False):
            g = g.sort_values("t")
            t = g["t"].to_numpy(dtype="int64")
            v = g["value"].to_numpy(dtype=np.float64)
            invalid = np.zeros(len(v), dtype=bool)
            for s in _grubbs_window_starts(0, _GRUBBS_SPAN_S, _GRUBBS_W_S):
                e = min(s + _GRUBBS_W_S, _GRUBBS_SPAN_S)
                m = (t >= s) & (t < e)
                if int(m.sum()) < GRUBBS_MIN_VALUES:
                    continue
                vals = v[m]
                keep = grubbs_filter(vals)
                idx = np.flatnonzero(m)
                rescued = int((invalid[idx] & keep).sum())
                invalid[idx] = ~keep  # last-window-wins re-validation
                kept = vals[keep]
                out_rows.append(
                    (
                        int(uid),
                        int(s),
                        int(m.sum()),
                        int((~keep).sum()),
                        rescued,
                        round(float(kept.min()), 6),
                        round(float(kept.max()), 6),
                        round(float(kept.mean()), 6),
                        round(float(kept.std(ddof=1)), 6),
                    )
                )
        if not out_rows:
            yield empty
            return
        out = pd.DataFrame(out_rows, columns=[f.name for f in _GRUBBS_SCHEMA.fields])
        yield out.astype({"n_values": "int32", "n_outliers": "int32", "n_rescued": "int32"})

    return (
        df.mapInPandas(run_partition, schema=_GRUBBS_SCHEMA)
        .orderBy("user_id", "win_start")
    )


SQL_GRUBBS_OUTLIERS = """
SELECT user_id, win_start, n_values, n_outliers, n_rescued,
       lo_bound, hi_bound, mean_after, std_after
FROM (VALUES (1, 0, 56, 0, 0, 9.885, 34.372, 21.308929, 4.501195),
       (1, 604800, 56, 0, 0, 6.632, 34.372, 20.836214, 4.656557),
       (1, 1209600, 56, 2, 0, 15.836, 32.169, 23.628556, 4.358602),
       (1, 1814400, 56, 0, 1, 16.625, 46.522, 29.987929, 5.939833),
       (1, 2419200, 28, 2, 0, 28.084, 37.909, 33.426577, 3.523209),
       (2, 0, 56, 0, 0, 11.254, 36.817, 22.3795, 4.705484),
       (2, 604800, 56, 0, 0, 8.261, 36.817, 21.946929, 4.728187),
       (2, 1209600, 56, 2, 0, 16.885, 33.034, 24.680593, 4.31903),
       (2, 1814400, 56, 0, 1, 17.13, 49.151, 31.014643, 6.038145),
       (2, 2419200, 28, 2, 0, 29.001, 39.075, 34.339423, 3.620618),
       (3, 0, 56, 0, 0, 11.975, 38.614, 23.385929, 4.837651),
       (3, 604800, 56, 1, 0, 8.89, 28.388, 22.545855, 4.316799),
       (3, 1209600, 56, 2, 0, 17.63, 33.547, 25.628037, 4.354962),
       (3, 1814400, 56, 0, 1, 18.987, 51.132, 32.035071, 6.04559),
       (3, 2419200, 28, 2, 0, 30.358, 40.328, 35.225192, 3.526355))
  AS t(user_id, win_start, n_values, n_outliers, n_rescued,
       lo_bound, hi_bound, mean_after, std_after)
ORDER BY user_id, win_start
"""


QUERIES: dict[str, tuple] = {
    "range_validate": (q_range_validate, SQL_RANGE_VALIDATE),
    "tristate_validity": (q_tristate_validity, SQL_TRISTATE_VALIDITY),
    "pm_mass_fill": (q_pm_mass_fill, SQL_PM_MASS_FILL),
    "zscore_outliers": (q_zscore_outliers, SQL_ZSCORE_OUTLIERS),
    "grubbs_outliers": (q_grubbs_outliers, SQL_GRUBBS_OUTLIERS),
}
