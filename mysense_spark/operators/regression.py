"""Regression / calibration analytics (SURVEY.md §2.10): closed-form OLS
over aligned series, R², min-max normalization, fit application.

The reference pulls series into numpy and runs np.polyfit
(statistics/MyRegression.py:860-866). Distributed rebuild: the J2
bucket-alignment join produces (x, y) pairs; sufficient statistics
(n, Σx, Σy, Σxy, Σx², Σy²) are exact decimal sums, so the closed-form
slope/intercept/R² is order-independent and identical to the oracle.
At 100 TB this is one shuffle (the alignment) plus one agg — no data
leaves the JVM."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import tracked_persist
from ..io import load
from .util import exact_avg, ieee_round, sql_avg

# decimal(18,6): wide enough for the 6-decimal bucket means, narrow
# enough that products stay exact at scale 12 on BOTH engines (28,6
# products exceed the 38-digit cap and Spark silently reduces scale)
_DEC = "decimal(18,6)"


def _aligned_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 alignment: per (kit, bucket) mean of X ('click') and Y
    ('purchase') — MyRegression.pickValue semantics. Daily buckets: the
    synthetic stream is sparse (~13 events/type/kit/month), so narrower
    buckets produce no aligned pairs and a vacuous fit."""
    ev = load(spark, sf_dir, "events")
    iv = 86400
    bucket = (F.floor(F.expr("unix_micros(ts) DIV 1000000") / iv) * iv).cast("long").alias("bucket")
    x = ev.where(F.col("event_type") == "click").groupBy("user_id", bucket).agg(
        exact_avg(F.col("value"), 6).alias("x")
    )
    y = ev.where(F.col("event_type") == "purchase").groupBy("user_id", bucket).agg(
        exact_avg(F.col("value"), 6).alias("y")
    )
    return x.join(y, ["user_id", "bucket"])


_SQL_ALIGNED = f"""
  SELECT x.user_id, x.bucket, x.x, y.y
  FROM (SELECT user_id, CAST(floor((epoch_us(ts) // 1000000) / 86400) * 86400 AS BIGINT) AS bucket,
               {sql_avg('value', 6)} AS x
        FROM events WHERE event_type = 'click' GROUP BY 1, 2) x
  JOIN (SELECT user_id, CAST(floor((epoch_us(ts) // 1000000) / 86400) * 86400 AS BIGINT) AS bucket,
               {sql_avg('value', 6)} AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) y
    ON x.user_id = y.user_id AND x.bucket = y.bucket
"""


def q_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1+R2: per-kit OLS fit y ~ a + b*x with R², closed form from exact
    sufficient statistics (np.polyfit order-1 equivalent,
    MyRegression.py:860-866 + R² :768-791)."""
    pairs = _aligned_pairs(spark, sf_dir)
    xd = F.col("x").cast(_DEC)
    yd = F.col("y").cast(_DEC)
    stats = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    n = F.col("n")
    den_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = num / den_x
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (num * num) / (den_x * den_y)
    return (
        stats.where((n >= 3) & (den_x > 0) & (den_y > 0))
        .select(
            "user_id",
            "n",
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
        .orderBy("user_id")
    )


SQL_LINEAR_REGRESSION = f"""
WITH pairs AS ({_SQL_ALIGNED}),
stats AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy
  FROM pairs GROUP BY user_id
)
SELECT user_id, n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM stats
WHERE n >= 3 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
ORDER BY user_id
"""


def q_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: min-max normalization to [0,1] per field
    (MyRegression.py:826-839) via a grouped min/max broadcast back."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    lo = F.min("value").over(w)
    hi = F.max("value").over(w)
    return (
        ev.withColumn("norm", F.round((F.col("value") - lo) / (hi - lo), 8))
        .select("event_id", "event_type", F.round("value", 4).alias("value"), "norm")
    )


SQL_MINMAX_NORMALIZE = """
SELECT event_id, event_type, round(value, 4) AS value,
       round((value - min(value) OVER (PARTITION BY event_type))
             / (max(value) OVER (PARTITION BY event_type) - min(value) OVER (PARTITION BY event_type)), 8) AS norm
FROM events
ORDER BY event_id
"""


def q_fit_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5: apply a fitted polynomial to a series ("corrected" values,
    getFitMatrix MyRegression.py:977-996), then summarize per kit."""
    ev = load(spark, sf_dir, "events")
    a0, a1 = 1.2345, 0.9876
    corrected = F.lit(a0) + F.lit(a1) * F.col("value")
    return (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_avg(corrected, 6).alias("avg_corrected"),
            ieee_round(F.min(corrected), 8).alias("min_corrected"),
            ieee_round(F.max(corrected), 8).alias("max_corrected"),
        )
        .orderBy("user_id")
    )


SQL_FIT_APPLY = f"""
SELECT user_id, count(*) AS n,
       {sql_avg('1.2345 + 0.9876 * value', 6)} AS avg_corrected,
       (floor((min(1.2345 + 0.9876 * value)) * CAST(100000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(100000000.0 AS DOUBLE)) AS min_corrected,
       (floor((max(1.2345 + 0.9876 * value)) * CAST(100000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(100000000.0 AS DOUBLE)) AS max_corrected
FROM events
WHERE event_type = 'error'
GROUP BY user_id
ORDER BY user_id
"""


def q_multilinear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: two-feature OLS y ~ a + b1*x1 + b2*x2 per kit
    (MyRegression.py:925-968 multi-linear mode), closed form via the
    2x2 normal equations on centered exact sums. 3-day alignment buckets
    (three series must co-occur). One shuffle + one agg, like R1."""
    ev = load(spark, sf_dir, "events")
    iv = 3 * 86400
    bucket = (F.floor(F.expr("unix_micros(ts) DIV 1000000") / iv) * iv).cast("long").alias("bucket")

    def series(t: str):
        return F.when(F.col("event_type") == t, F.col("value"))

    pivot = ev.groupBy("user_id", bucket).agg(
        exact_avg(series("click"), 6).alias("x1"),
        exact_avg(series("view"), 6).alias("x2"),
        exact_avg(series("purchase"), 6).alias("y"),
    ).where(F.col("x1").isNotNull() & F.col("x2").isNotNull() & F.col("y").isNotNull())

    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    stats = pivot.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("x1")).cast("double").alias("s1"),
        F.sum(d("x2")).cast("double").alias("s2"),
        F.sum(d("y")).cast("double").alias("sy"),
        F.sum(d("x1") * d("x1")).cast("double").alias("s11"),
        F.sum(d("x1") * d("x2")).cast("double").alias("s12"),
        F.sum(d("x2") * d("x2")).cast("double").alias("s22"),
        F.sum(d("x1") * d("y")).cast("double").alias("s1y"),
        F.sum(d("x2") * d("y")).cast("double").alias("s2y"),
        F.sum(d("y") * d("y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    c11 = n * F.col("s11") - F.col("s1") * F.col("s1")
    c12 = n * F.col("s12") - F.col("s1") * F.col("s2")
    c22 = n * F.col("s22") - F.col("s2") * F.col("s2")
    c1y = n * F.col("s1y") - F.col("s1") * F.col("sy")
    c2y = n * F.col("s2y") - F.col("s2") * F.col("sy")
    cyy = n * F.col("syy") - F.col("sy") * F.col("sy")
    den = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / den
    b2 = (c11 * c2y - c12 * c1y) / den
    a = (F.col("sy") - b1 * F.col("s1") - b2 * F.col("s2")) / n
    r2 = (b1 * c1y + b2 * c2y) / cyy
    return (
        stats.where((n >= 4) & (den > 0) & (cyy > 0))
        .select(
            "user_id",
            "n",
            F.round(b1, 6).alias("b1"),
            F.round(b2, 6).alias("b2"),
            F.round(a, 6).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
        .orderBy("user_id")
    )


def _sql_multilinear() -> str:
    dd = lambda c: f"CAST({c} AS DECIMAL(19,6))"  # noqa: E731
    savg = lambda t: sql_avg(f"CASE WHEN event_type = '{t}' THEN value END", 6)  # noqa: E731
    return f"""
WITH piv AS (
  SELECT user_id, CAST(floor((epoch_us(ts) // 1000000) / 259200) * 259200 AS BIGINT) AS bucket,
         {savg('click')} AS x1, {savg('view')} AS x2, {savg('purchase')} AS y
  FROM events GROUP BY 1, 2
), filtered AS (
  SELECT * FROM piv WHERE x1 IS NOT NULL AND x2 IS NOT NULL AND y IS NOT NULL
), stats AS (
  SELECT user_id, count(*) AS n,
         CAST(sum({dd('x1')}) AS DOUBLE) AS s1,
         CAST(sum({dd('x2')}) AS DOUBLE) AS s2,
         CAST(sum({dd('y')}) AS DOUBLE) AS sy,
         CAST(sum({dd('x1')} * {dd('x1')}) AS DOUBLE) AS s11,
         CAST(sum({dd('x1')} * {dd('x2')}) AS DOUBLE) AS s12,
         CAST(sum({dd('x2')} * {dd('x2')}) AS DOUBLE) AS s22,
         CAST(sum({dd('x1')} * {dd('y')}) AS DOUBLE) AS s1y,
         CAST(sum({dd('x2')} * {dd('y')}) AS DOUBLE) AS s2y,
         CAST(sum({dd('y')} * {dd('y')}) AS DOUBLE) AS syy
  FROM filtered GROUP BY user_id
), solved AS (
  SELECT user_id, n,
         (n * s11 - s1 * s1) AS c11, (n * s12 - s1 * s2) AS c12,
         (n * s22 - s2 * s2) AS c22, (n * s1y - s1 * sy) AS c1y,
         (n * s2y - s2 * sy) AS c2y, (n * syy - sy * sy) AS cyy,
         s1, s2, sy
  FROM stats
)
SELECT user_id, n,
       round((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12), 6) AS b1,
       round((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12), 6) AS b2,
       round((sy - ((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12)) * s1
                 - ((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12)) * s2) / n, 6) AS intercept,
       round((((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12)) * c1y
            + ((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12)) * c2y) / cyy, 6) AS r2
FROM solved
WHERE n >= 4 AND (c11 * c22 - c12 * c12) > 0 AND cyy > 0
ORDER BY user_id
"""


SQL_MULTILINEAR_REGRESSION = _sql_multilinear()


# ---------------------------------------------------------------------------
# R2 tail: full OLS summary — se / t / p / R²-adjusted
# ---------------------------------------------------------------------------

# The t-distribution survival function isn't SQL-native in either engine,
# so p-values use a documented elementary approximation evaluated with
# IDENTICAL arithmetic on both sides (so the hash check stays exact):
# t -> z via Hill's expansion (CACM Algorithm 395, 1970), then the
# Abramowitz-Stegun 26.2.17 polynomial for the normal CDF. Measured
# absolute error vs the exact t tail: <= 1.5e-4 at df=2, <= 5e-7 for
# df >= 5 — the reference's statsmodels reports print p to 3 decimals,
# so approximation error is below reporting precision everywhere.
def _sql_norm_sf(z: str) -> str:
    """One-sided normal survival function 1 - Phi(z) for z >= 0."""
    k = f"(1.0 / (1.0 + 0.2316419 * {z}))"
    poly = (
        f"({k} * (0.319381530 + {k} * (-0.356563782 + {k} * "
        f"(1.781477937 + {k} * (-1.821255978 + {k} * 1.330274429)))))"
    )
    pdf = f"(0.3989422804014327 * exp(-0.5 * {z} * {z}))"
    return f"({pdf} * {poly})"


# Projection layers (identical in both engines, so the float arithmetic
# sequence is identical): centered moments -> unrounded se/t -> Hill w ->
# Hill z -> rounded report + p-values. Layering keeps the expression tree
# small (a single inlined layer bloated the task binary to ~6 MiB, and
# the inlined-p variant cost ~1.4 s of driver-side planning alone: every
# reference to `w` duplicated its whole subtree, and Catalyst re-walks
# the duplicates per rule). Spark's CollapseProject leaves non-cheap
# aliases that are referenced more than once in place, so the layers
# survive optimization on the Spark side; DuckDB gets the same layers as
# chained CTEs.
_OLS_DERIVED = """
  SELECT user_id, n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
         sxx - sx * sx / n AS cxx,
         syy - sy * sy / n AS cyy,
         sxy - sx * sy / n AS cxy,
         sx / n AS xbar
  FROM stats
  WHERE n >= 4 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
"""

# RSS = cyy - slope*cxy; s² = RSS/(n-2); se² per standard simple-OLS.
# greatest(RSS, 0): on perfectly collinear data the residual evaluates
# to a tiny NEGATIVE double via cancellation — identical on both
# engines, but DuckDB hard-errors on sqrt(negative) while Spark yields
# NaN, so an unguarded form crashes the oracle (util.exact_std guards
# the same pattern)
_OLS_TSTAT_COLS = """
  user_id,
  n,
  slope,
  intercept,
  slope * cxy / cyy AS r2,
  sqrt((greatest(cyy - slope * cxy, 0.0) / (n - 2.0)) / cxx) AS se_s,
  sqrt((greatest(cyy - slope * cxy, 0.0) / (n - 2.0)) * (1.0 / n + xbar * xbar / cxx)) AS se_i
"""

# Hill's t->z (two-sided p = 2 * norm_sf(z)), split so each repeated
# subterm is computed once as a named column. Powers stay explicit
# multiplication chains: IEEE-754 *, +, / are exactly reproducible
# across engines, pow() need not be.
_OLS_W_COLS = """
  user_id,
  n,
  slope,
  intercept,
  r2,
  se_s,
  se_i,
  48.0 * ((n - 2.0) - 0.5) * ((n - 2.0) - 0.5) AS hb,
  sqrt(((n - 2.0) - 0.5) * ln(1.0 + abs(slope / nullif(se_s, 0.0)) * abs(slope / nullif(se_s, 0.0)) / (n - 2.0))) AS w_s,
  sqrt(((n - 2.0) - 0.5) * ln(1.0 + abs(intercept / nullif(se_i, 0.0)) * abs(intercept / nullif(se_i, 0.0)) / (n - 2.0))) AS w_i
"""


def _hill_z(w: str) -> str:
    w2 = f"({w} * {w})"
    return (
        f"({w} + ({w2} * {w} + 3.0 * {w}) / hb "
        f"- (4.0 * {w2} * {w2} * {w2} * {w} + 33.0 * {w2} * {w2} * {w} "
        f"+ 240.0 * {w2} * {w} + 855.0 * {w}) "
        f"/ (10.0 * hb * (hb + 0.8 * {w2} * {w2} + 100.0)))"
    )


_OLS_Z_COLS = f"""
  user_id,
  n,
  slope,
  intercept,
  r2,
  se_s,
  se_i,
  {_hill_z('w_s')} AS z_s,
  {_hill_z('w_i')} AS z_i
"""

_OLS_FINAL_COLS = """
  user_id,
  n,
  round(slope, 6) AS slope,
  round(intercept, 6) AS intercept,
  round(r2, 6) AS r2,
  round(1.0 - (1.0 - r2) * (n - 1.0) / (n - 2.0), 6) AS r2_adj,
  round(se_s, 6) AS se_slope,
  round(se_i, 6) AS se_intercept,
  round(slope / se_s, 6) AS t_slope,
  round(intercept / se_i, 6) AS t_intercept,
  round(2.0 * {p_s}, 6) AS p_slope,
  round(2.0 * {p_i}, 6) AS p_intercept
""".format(p_s=_sql_norm_sf("z_s"), p_i=_sql_norm_sf("z_i"))


def q_ols_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 complete: per-kit OLS summary — slope/intercept, standard
    errors, t statistics, two-sided p-values, R² and adjusted R² — the
    statsmodels summary fields the reference's correlation reports print
    (MyRegression.py:848-857 getLMFit: rsquared, params; its .summary()
    carries se/t/p/R²-adj). Closed form from the same exact decimal
    sufficient statistics as linear_regression: one alignment shuffle +
    one agg, then pure scalar math on the per-kit row — the p-value
    expression is shared TEXT between the Spark plan and the DuckDB
    oracle, so both engines run bit-identical arithmetic."""
    pairs = _aligned_pairs(spark, sf_dir)
    xd = F.col("x").cast(_DEC)
    yd = F.col("y").cast(_DEC)
    stats = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    n = F.col("n")
    def exprs(cols: str) -> list[str]:
        return [c.strip() for c in cols.split(",\n") if c.strip()]

    derived = stats.where(
        (n >= 4)
        & (n * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (n * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    ).selectExpr(
        "user_id",
        "n",
        "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope",
        "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept",
        "sxx - sx * sx / n AS cxx",
        "syy - sy * sy / n AS cyy",
        "sxy - sx * sy / n AS cxy",
        "sx / n AS xbar",
    )
    return (
        derived.selectExpr(*exprs(_OLS_TSTAT_COLS))
        .selectExpr(*exprs(_OLS_W_COLS))
        .selectExpr(*exprs(_OLS_Z_COLS))
        .selectExpr(*exprs(_OLS_FINAL_COLS))
        .orderBy("user_id")
    )


SQL_OLS_SUMMARY = f"""
WITH pairs AS ({_SQL_ALIGNED}),
stats AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy
  FROM pairs GROUP BY user_id
),
derived AS ({_OLS_DERIVED}),
tstats AS (SELECT {_OLS_TSTAT_COLS} FROM derived),
hw AS (SELECT {_OLS_W_COLS} FROM tstats),
hz AS (SELECT {_OLS_Z_COLS} FROM hw)
SELECT {_OLS_FINAL_COLS}
FROM hz
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# R6: Gaussian-smoothed series + sigma band
# ---------------------------------------------------------------------------

# Frozen Gaussian kernel (width 39, sigma 3) — the reference's
# moving_average weights (grubbs.py:1043-1050: scipy gaussian(39,3)
# convolution for the weighted-spline average and variance band,
# MyRegression.py:1008-1018 makeSpline). Literals, not exp() at runtime,
# so both engines consume identical weights.
def _gaussian_kernel() -> list[tuple[int, float]]:
    import math

    ws = [(j, round(math.exp(-(j * j) / 18.0), 8)) for j in range(-19, 20)]
    # entries that round to 0 at 8 dp (|j| = 19) contribute nothing but
    # can make a lone far target's weight-sum exactly 0 -> divide-by-zero
    return [(j, w) for j, w in ws if w > 0]


_KERNEL = _gaussian_kernel()


def q_sigma_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6: smoothed series + sigma band per kit — the reference's
    weighted-spline preprocessing (grubbs.py:1039-1074): a Gaussian
    kernel (39, sigma=3) moving average over the hourly series, the
    kernel-weighted variance of deviations from it, and the resulting
    avg +/- 2*sqrt(var) band with an outside-band flag (the sigma band
    drawn on the correlation plots; propability(), grubbs.py:1073).
    Kernel weights renormalize over present neighbours, so gaps widen
    the band instead of biasing it.

    Scale shape: the convolution is an explode-by-39 + one groupBy on
    (kit, bucket) — bounded 39x row amplification, no window over
    unbounded partitions, all exact decimal accumulation (order-
    independent, hash-stable)."""
    from ..io import values_df

    ev = load(spark, sf_dir, "events")
    bucket = F.expr("unix_micros(ts) DIV 1000000 DIV 3600").alias("b")
    # series feeds three consumers (smooth convolve, the join, the
    # variance convolve); without persist Spark re-scans and re-aggregates
    # events for each (measured: 4 parquet scans, 0 reused exchanges)
    series = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.col("user_id"), bucket)
        .agg(exact_avg(F.col("value"), 6).alias("v"))
    )
    series = tracked_persist(series)
    kern = values_df(
        spark, [(j, str(w)) for j, w in _KERNEL], "off int, w_s string"
    ).select("off", F.col("w_s").cast("decimal(10,8)").alias("w"))

    def convolve(src: DataFrame, val_col: str, out: str) -> DataFrame:
        """Σ w·val / Σ w at each present target bucket (renormalizing
        over present neighbours, like convolve1d over a dense grid)."""
        contrib = src.crossJoin(F.broadcast(kern)).select(
            "user_id",
            (F.col("b") + F.col("off")).alias("b"),
            F.col("w"),
            (F.col("w") * F.col(val_col).cast(_DEC)).alias("wv"),
        )
        sums = contrib.groupBy("user_id", "b").agg(
            F.sum("w").alias("sw"), F.sum("wv").alias("swv")
        )
        return sums.select(
            "user_id",
            "b",
            F.round(F.col("swv").cast("double") / F.col("sw").cast("double"), 6).alias(out),
        )

    smooth = convolve(series, "v", "smooth")
    joined = tracked_persist(series.join(smooth, ["user_id", "b"]))
    dev = joined.withColumn(
        "dev2", F.round((F.col("v") - F.col("smooth")) * (F.col("v") - F.col("smooth")), 6)
    )
    var = convolve(dev, "dev2", "var_v")
    return (
        joined.join(var, ["user_id", "b"])
        .select(
            "user_id",
            "b",
            F.round("v", 6).alias("v"),
            "smooth",
            F.round(F.sqrt("var_v"), 6).alias("sigma"),
            F.round(F.col("smooth") - 2 * F.sqrt("var_v"), 6).alias("band_lo"),
            F.round(F.col("smooth") + 2 * F.sqrt("var_v"), 6).alias("band_hi"),
            (F.abs(F.col("v") - F.col("smooth")) > 2 * F.sqrt("var_v")).alias("outside"),
        )
        .orderBy("user_id", "b")
    )


def _sql_sigma_band() -> str:
    kern_rows = ", ".join(f"({j}, CAST({w!r} AS DECIMAL(10,8)))" for j, w in _KERNEL)
    return f"""
WITH series AS (
  SELECT user_id, epoch_us(ts) // 1000000 // 3600 AS b, {sql_avg('value', 6)} AS v
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
kern(off, w) AS (VALUES {kern_rows}),
smooth AS (
  SELECT user_id, b + off AS b,
         round(CAST(sum(w * CAST(v AS DECIMAL(19,6))) AS DOUBLE)
               / CAST(sum(w) AS DOUBLE), 6) AS smooth
  FROM series CROSS JOIN kern
  GROUP BY 1, 2
),
joined AS (
  SELECT s.user_id, s.b, s.v, m.smooth,
         round((s.v - m.smooth) * (s.v - m.smooth), 6) AS dev2
  FROM series s JOIN smooth m ON s.user_id = m.user_id AND s.b = m.b
),
var_c AS (
  SELECT user_id, b + off AS b,
         round(CAST(sum(w * CAST(dev2 AS DECIMAL(19,6))) AS DOUBLE)
               / CAST(sum(w) AS DOUBLE), 6) AS var_v
  FROM joined CROSS JOIN kern
  GROUP BY 1, 2
)
SELECT j.user_id, j.b, round(j.v, 6) AS v, j.smooth,
       round(sqrt(c.var_v), 6) AS sigma,
       round(j.smooth - 2 * sqrt(c.var_v), 6) AS band_lo,
       round(j.smooth + 2 * sqrt(c.var_v), 6) AS band_hi,
       abs(j.v - j.smooth) > 2 * sqrt(c.var_v) AS outside
FROM joined j JOIN var_c c ON j.user_id = c.user_id AND j.b = c.b
ORDER BY j.user_id, j.b
"""


SQL_SIGMA_BAND = _sql_sigma_band()


QUERIES: dict[str, tuple] = {
    "linear_regression": (q_linear_regression, SQL_LINEAR_REGRESSION),
    "ols_summary": (q_ols_summary, SQL_OLS_SUMMARY),
    "sigma_band": (q_sigma_band, SQL_SIGMA_BAND),
    "multilinear_regression": (q_multilinear_regression, SQL_MULTILINEAR_REGRESSION),
    "minmax_normalize": (q_minmax_normalize, SQL_MINMAX_NORMALIZE),
    "fit_apply": (q_fit_apply, SQL_FIT_APPLY),
}
