"""Shared expression helpers keeping Spark output bit-identical to the
ANSI-SQL oracles regardless of partitioning.

Floating-point sums are order-dependent; Spark's shuffle partitioning (and
therefore partial-agg order) differs from DuckDB's scan order, so a plain
`round(avg(x), 6)` can flip its last digit between engines. Every helper
here accumulates in exact DECIMAL after a deterministic per-row rounding,
then performs a single, fixed-order double computation — identical on any
engine and any partitioning. This also makes results stable across cluster
sizes, which matters for reproducible pipelines at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# per-row quantization scale: 6 decimals is finer than any source column
# (measurements are 1-3 decimals; prices 2) so semantics are unchanged.
_ROW_SCALE = 6
# decimal(18,6): products must stay exact at scale 12 on both engines;
# (28,6) squares would exceed the 38-digit cap and Spark silently
# reduces the result scale while DuckDB does not
_DEC = "decimal(18,6)"


def _dec(expr: Column) -> Column:
    return F.round(expr, _ROW_SCALE).cast(_DEC)


def _scaled_long(expr: Column) -> Column:
    # exact unscaled representation of the quantized value: round(x,6)*1e6
    # as an integer. The decimal cast happens per row (cheap, codegen'd);
    # what it buys is avoiding Spark's Decimal *aggregation buffer*, which
    # runs ~6x slower than a long sum (measured: 7 decimal aggs over 600k
    # rows = 3.2s vs 0.6s as longs).
    return (_dec(expr) * 1000000).cast("long")


def _unscale(sum_long: Column) -> Column:
    # long partial sums -> exact decimal -> double, so the final double is
    # bit-identical to `cast(sum(decimal) as double)` on any engine.
    return (sum_long.cast("decimal(38,0)") / F.lit(1000000)).cast("double")


def exact_sum(expr: Column, nd: int = 4) -> Column:
    """Order-independent sum: per-row quantize -> exact long sum -> double.

    Exact while the group's |sum| * 1e6 fits in int64, i.e. group sums up
    to ~9.2e12 in value units — ample for sensor measurements at any SF
    and for price sums through sf~1000. Beyond that (unbounded groups at
    100 TB), accumulate per shuffle partition first (groupBy(keys,
    spark_partition_id()) then re-aggregate the few partials in decimal)
    or use the decimal-buffer form `F.sum(_dec(e))` — same semantics,
    slower buffer.
    """
    return F.round(_unscale(F.sum(_scaled_long(expr))), nd)


def exact_avg(expr: Column, nd: int = 6) -> Column:
    """Order-independent mean with SQL null-skipping semantics."""
    return F.round(_unscale(F.sum(_scaled_long(expr))) / F.count(expr), nd)


def exact_std(expr: Column, nd: int = 6) -> Column:
    """Order-independent sample stddev from exact decimal (sum, sum-of-squares).

    NULL for n<=1 (ANSI semantics; Spark's stddev would yield NaN)."""
    xd = _dec(expr)
    s1 = _unscale(F.sum(_scaled_long(expr)))
    # squares need scale 12 — their scaled-long form can overflow per row
    # (price^2 * 1e12 > 2^63), so the square term keeps the decimal buffer
    s2 = F.sum(xd * xd).cast("double")
    n = F.count(expr)
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return F.when(n > 1, F.round(F.sqrt(F.greatest(var, F.lit(0.0))), nd)).otherwise(F.lit(None).cast("double"))


def exact_sum_grouped(df, keys: list[str], sums: dict[str, Column], nd: int = 4):
    """100 TB-safe exact grouped sum: two-stage accumulation.

    Stage 1 sums the scaled-long quantized values per (keys, shuffle
    partition) — each partial is bounded by partition size (a 32 MB
    task's |sum| stays far under 2^63), so int64 never overflows no
    matter how large the GROUP is. Stage 2 re-aggregates the few
    partials per key in decimal(38,0) — exact at any corpus size.

    This is the documented fallback for `exact_sum`'s per-group bound
    (see PLANS.md design note); same bit-identical result, one extra
    (tiny) shuffle stage.
    """
    stage1 = df.groupBy(*keys, F.spark_partition_id().alias("_pid")).agg(
        *[F.sum(_scaled_long(c)).alias(f"_s_{n}") for n, c in sums.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[
            F.round(
                (F.sum(F.col(f"_s_{n}").cast("decimal(38,0)")) / F.lit(1000000)).cast("double"),
                nd,
            ).alias(n)
            for n in sums
        ]
    )


# --- SQL twins (DuckDB) ----------------------------------------------------

def sql_dec(e: str) -> str:
    # 19 digits: forces DuckDB onto the int128 multiply path (exact scale-12
    # products); Spark uses 18 to stay under its 38-digit cap without scale loss
    return f"CAST(round({e}, {_ROW_SCALE}) AS DECIMAL(19,6))"


def sql_sum(e: str, nd: int = 4) -> str:
    return f"round(CAST(sum({sql_dec(e)}) AS DOUBLE), {nd})"


def sql_avg(e: str, nd: int = 6) -> str:
    return f"round(CAST(sum({sql_dec(e)}) AS DOUBLE) / count({e}), {nd})"


def sql_std(e: str, nd: int = 6) -> str:
    s1 = f"CAST(sum({sql_dec(e)}) AS DOUBLE)"
    s2 = f"CAST(sum({sql_dec(e)} * {sql_dec(e)}) AS DOUBLE)"
    n = f"count({e})"
    var = f"(({s2} - {s1} * {s1} / {n}) / ({n} - 1))"
    return f"CASE WHEN {n} > 1 THEN round(sqrt(greatest({var}, 0.0)), {nd}) ELSE NULL END"


def stddev_null(col) -> Column:
    """Sample stddev with SQL NULL semantics: Spark's stddev_samp yields NaN
    for 1-element groups where ANSI engines (DuckDB) yield NULL."""
    s = F.stddev(col)
    return F.when(F.isnan(s), F.lit(None).cast("double")).otherwise(s)


def nan_to_null(c: Column) -> Column:
    return F.when(F.isnan(c), F.lit(None).cast("double")).otherwise(c)
