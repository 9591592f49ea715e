"""Relational core: scans, joins, aggregations on the star schema.

These exercise the engine's join/agg surface (SURVEY.md §2.4/§2.5) on the
driver's TPC-H-ish tables. Everything is declarative DataFrame API so
Catalyst gets pushdown, pruning, join reordering and AQE for free — the
reference hand-writes each of these as SQL strings against MySQL
(e.g. statistics/grubbs.py:858-863, lib/MyMQTTclient.py:750-767).

Scale notes (100 TB):
- dimension tables (region/nation/customer/supplier/part) are broadcast —
  never shuffled against the fact tables.
- fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE handles
  skew. At cluster scale the fact tables would be bucketed by orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import tracked_persist
from ..io import load
from .util import exact_avg, exact_std, exact_sum, sql_avg, sql_std, sql_sum


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (A1 descriptive statistics).

    Reference analog: doStatistics per (kit, field, period),
    statistics/grubbs.py:851-887 — COUNT/AVG/STDDEV/MIN/MAX per group.
    Single shuffle on the two low-cardinality group keys; partial
    aggregation (map-side combine) makes this bandwidth-bound on the scan.
    """
    from .util import _scaled_long, ieee_round

    li = load(spark, sf_dir, "lineitem")
    # Two-stage accumulation (the exact_sum_grouped form, inlined so the
    # avg columns share the same partials): these groups span the WHOLE
    # fact table, so a single int64 sum of scaled values overflows once
    # |group value-sum| exceeds ~9.2e12 — certain at 100 TB. Stage 1
    # sums scaled longs per (group, shuffle partition) — bounded by
    # partition size, never overflows; stage 2 re-sums the few partials
    # in decimal(38,0) — exact at any corpus size. Same bit-exact result
    # as the direct form (integer addition is associative), one extra
    # tiny shuffle.
    filtered = li.where(F.col("l_shipdate") <= F.lit("2024-11-01").cast("timestamp"))
    measures = {
        "qty": F.col("l_quantity"),
        "price": F.col("l_extendedprice"),
        "disc_price": F.col("l_extendedprice") * (1 - F.col("l_discount")),
        "charge": F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
        "disc": F.col("l_discount"),
    }
    stage1 = filtered.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid")
    ).agg(
        *[F.sum(_scaled_long(c)).alias(f"_s_{k}") for k, c in measures.items()],
        F.count(F.lit(1)).alias("_n"),
    )

    def final_sum(k: str) -> F.Column:
        return (F.sum(F.col(f"_s_{k}").cast("decimal(38,0)")) / F.lit(1000000)).cast("double")

    n = F.sum("_n")
    return (
        stage1.groupBy("l_returnflag", "l_linestatus")
        .agg(
            ieee_round(final_sum("qty"), 4).alias("sum_qty"),
            ieee_round(final_sum("price"), 4).alias("sum_base_price"),
            ieee_round(final_sum("disc_price"), 4).alias("sum_disc_price"),
            ieee_round(final_sum("charge"), 4).alias("sum_charge"),
            ieee_round(final_sum("qty") / n, 6).alias("avg_qty"),
            ieee_round(final_sum("price") / n, 6).alias("avg_price"),
            ieee_round(final_sum("disc") / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       {sql_sum('l_quantity', 4)} AS sum_qty,
       {sql_sum('l_extendedprice', 4)} AS sum_base_price,
       {sql_sum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {sql_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 4)} AS sum_charge,
       {sql_avg('l_quantity', 6)} AS avg_qty,
       {sql_avg('l_extendedprice', 6)} AS avg_price,
       {sql_avg('l_discount', 6)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-11-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by revenue (W6 top-N + J1-style joins).

    Revenue is aggregated per l_orderkey BEFORE the joins — legal
    because the remaining group keys are functionally dependent on the
    order key, and a pushdown Catalyst does not do on its own. The join
    then moves one row per order instead of one per line item (the
    lineitem:orders fan-in, ~4x fewer rows and no join-widened payload
    through the agg; measured 2.7s -> 1.6s at sf0.1). At 100 TB the
    rev⋈orders join shuffles on the already-keyed order key (or
    broadcasts under AQE when the reduced side fits); customer stays an
    explicit broadcast dim. Deterministic tie-break on o_orderkey.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_orderkey").agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
    )
    return (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_name", "o_orderdate", "revenue")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_TOP_REVENUE_ORDERS = f"""
SELECT o_orderkey, c_name, o_orderdate,
       {sql_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderkey, c_name, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per region/nation through the full dimension chain (J6).

    All four dims broadcast; the only shuffle is the final groupBy —
    and AQE coalesces it. At 100 TB this plan is unchanged.
    """
    from .util import _scaled_long, ieee_round

    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # Revenue partial-aggregated per order BEFORE the join chain (the
    # top_revenue_orders pushdown): the joins move one row per order,
    # not one per line item — measured 3.2s -> 2.0s at sf0.1, and at
    # scale it is ~4x fewer shuffled rows. Exactness holds because the
    # partial is a sum of scaled int64 and integer addition is
    # associative — the final decimal re-sum equals the direct
    # exact_sum bit-for-bit on any partitioning.
    rev = li.groupBy("l_orderkey").agg(
        F.sum(_scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "rev_scaled"
        ),
        F.count(F.lit(1)).alias("n_li"),
    )
    return (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            # ieee_round (floor form), matching sql_sum — F.round here is
            # the cross-engine last-digit flip ADVICE r3 flagged
            ieee_round(
                (F.sum(F.col("rev_scaled").cast("decimal(38,0)")) / F.lit(1000000)).cast(
                    "double"
                ),
                4,
            ).alias("revenue"),
            F.sum("n_li").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


SQL_REGION_REVENUE = f"""
SELECT r_name, n_name,
       {sql_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q_part_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (brand, supplier-nation) lineitem stats — A1 over a 3-way join
    with two broadcast dims; stddev_samp matches DuckDB stddev."""
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_avg(F.col("l_quantity"), 6).alias("avg_qty"),
            exact_std(F.col("l_quantity"), 6).alias("std_qty"),
            F.round(F.min("l_extendedprice"), 4).alias("min_price"),
            F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        )
        .orderBy("p_brand", "n_name")
    )


SQL_PART_SUPPLIER_STATS = f"""
SELECT p_brand, n_name,
       count(*) AS n_items,
       {sql_avg('l_quantity', 6)} AS avg_qty,
       {sql_std('l_quantity', 6)} AS std_qty,
       round(min(l_extendedprice), 4) AS min_price,
       round(max(l_extendedprice), 4) AS max_price
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY p_brand, n_name
ORDER BY p_brand, n_name
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — the reference's implicit 'unknown kit skip'
    (MyDatacollector.py:1005-1017 KnownKit) expressed as LEFT ANTI.
    Predicate: no premium (>400k) order — every synthetic customer has
    at least one order, so the unfiltered anti join would be vacuous."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
ORDER BY c_custkey
"""


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join + conditional agg (A10 coverage-style counting)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    with_items = orders.join(
        li.select("l_orderkey").distinct(), orders.o_orderkey == F.col("l_orderkey"), "left_semi"
    )
    return (
        with_items.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("finished_count"),
            exact_avg(F.col("o_totalprice"), 4).alias("avg_totalprice"),
        )
        .orderBy("o_orderpriority")
    )


SQL_ORDER_PRIORITY_COUNTS = f"""
SELECT o_orderpriority,
       count(*) AS order_count,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished_count,
       {sql_avg('o_totalprice', 4)} AS avg_totalprice
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL surface: the same pricing-summary semantics
    submitted as a `spark.sql` string over registered views — proving a
    MySense user can stay in pure SQL. Dialect differences vs the DuckDB
    oracle are confined to epoch helpers (none needed here)."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(CAST(CAST(sum(CAST(CAST(round(l_quantity, 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT))
                               AS DECIMAL(38,0)) / 1000000 AS DOUBLE), 4) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-11-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


SQL_SQL_INTERFACE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_sum('l_quantity', 4)} AS sum_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-11-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: revenue by region/nation with ROLLUP.

    SURVEY §2.5 notes grouping sets/rollup are absent in the reference
    (every report hand-loops per kit, e.g. statistics/grubbs.py:536-549
    showTables) — Spark computes all levels in one pass with partial
    aggregation; the rollup adds no extra shuffle over the plain groupBy."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    lvl = F.grouping(F.col("r_name")) * 2 + F.grouping(F.col("n_name"))
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            lvl.alias("lvl"),
            exact_sum(F.col("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("lvl", "r_name", "n_name")
    )


SQL_REGION_ROLLUP = f"""
SELECT r_name, n_name,
       2 * GROUPING(r_name) + GROUPING(n_name) AS lvl,
       {sql_sum('o_totalprice', 4)} AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY lvl, r_name, n_name
"""


def q_revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend quartiles per market segment (ntile — SURVEY §2.6
    notes rank/ntile are absent in the reference, free in Spark).

    A window ntile with no PARTITION BY would force the whole relation
    through one task; instead the global rank is computed distributed:
    range-repartition on the sort key (disjoint ordered ranges), per-
    partition row_number, plus a broadcast per-partition offset — the
    same work a global window does, minus the single-partition bottleneck.
    The exact ntile bucket then follows closed-form from (rank, n): the
    first n%4 buckets take ceil(n/4) rows, the rest floor(n/4) — bit-
    identical to SQL ntile for any n, so the DuckDB oracle stays ntile."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    spend = (
        orders.groupBy("o_custkey")
        .agg(exact_sum(F.col("o_totalprice"), 4).alias("spend"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
    )
    par = spark.sparkContext.defaultParallelism
    # (spend, o_custkey) is a unique total order, so range partitions are
    # strictly disjoint and within-partition row_number + offset = global
    # row_number
    # persist is CORRECTNESS here, not caching: ranged feeds two plan
    # branches (the per-partition counts and the final rank join), and
    # each unpersisted execution re-runs repartitionByRange with its own
    # boundary SAMPLE — offsets from one partitioning then pair with
    # row_numbers from another, corrupting global ranks (observed at
    # sf0.1: a phantom 5th quartile). Materializing pins one
    # partitioning for both consumers.
    ranged = (
        spend.repartitionByRange(par, F.desc("spend"), F.asc("o_custkey"))
        .withColumn("pid", F.spark_partition_id())
    )
    ranged = tracked_persist(ranged)
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        counts.withColumn("offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy()))
        .select("pid", "offset", "n")
    )  # P rows — the only single-partition window runs over partition COUNTS
    w_local = Window.partitionBy("pid").orderBy(F.desc("spend"), F.asc("o_custkey"))
    q_sz = (F.col("n") / 4).cast("long")  # floor bucket size
    rem = F.col("n") % 4  # first `rem` buckets take q_sz+1
    big_span = rem * (q_sz + 1)
    rank = F.col("local_rn") + F.col("offset")
    quartile = (
        F.when(q_sz == 0, rank)  # n < 4: one row per bucket
        .when(rank <= big_span, F.ceil(rank / (q_sz + 1)))
        .otherwise(rem + F.ceil((rank - big_span) / q_sz))
        .cast("int")
    )
    return (
        ranged.withColumn("local_rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "pid")
        .withColumn("quartile", quartile)
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_avg(F.col("spend"), 4).alias("avg_spend"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


SQL_REVENUE_QUARTILES = f"""
WITH spend AS (
  SELECT o_custkey, {sql_sum('o_totalprice', 4)} AS spend
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT c_mktsegment, spend,
         ntile(4) OVER (ORDER BY spend DESC, o_custkey ASC) AS quartile
  FROM spend JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, quartile, count(*) AS n_customers,
       {sql_avg('spend', 4)} AS avg_spend
FROM ranked
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "region_rollup": (q_region_rollup, SQL_REGION_ROLLUP),
    "revenue_quartiles": (q_revenue_quartiles, SQL_REVENUE_QUARTILES),
    "sql_interface": (q_sql_interface, SQL_SQL_INTERFACE),
    "top_revenue_orders": (q_top_revenue_orders, SQL_TOP_REVENUE_ORDERS),
    "region_revenue": (q_region_revenue, SQL_REGION_REVENUE),
    "part_supplier_stats": (q_part_supplier_stats, SQL_PART_SUPPLIER_STATS),
    "customers_without_orders": (q_customers_without_orders, SQL_CUSTOMERS_WITHOUT_ORDERS),
    "order_priority_counts": (q_order_priority_counts, SQL_ORDER_PRIORITY_COUNTS),
}
