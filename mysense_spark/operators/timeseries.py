"""Time-series operators over the `events` stream table — the heart of the
MySense semantics: time-bucket aggregation, latest-per-key, run-length
(static-sensor) detection, gap/restart detection, interval inference,
dead-kit liveness, gap-filled regular grids, moving averages, as-of
alignment joins.

Mapping: events.user_id ≈ kit_id, events.event_type ≈ field,
events.value ≈ measurement (FIXTURES.md §9).

Scale notes: every operator here groups/windows by user_id (kit) — the
natural partitioning key of the 100 TB fact table. One shuffle on
(user_id) serves all window functions; time-bucket aggs shuffle on
(bucket, key) with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from .util import exact_avg, exact_std, exact_sum, ieee_round, sql_avg, sql_std, sql_sum


def q_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: tumbling time-bucket AVG/STDDEV per field (grubbs.py:1137-1143,
    `GROUP BY timeslice`), expressed as date_trunc — the canonical
    hourly-aggregate query behind every MySense chart."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_avg(F.col("value"), 6).alias("avg_value"),
            exact_std(F.col("value"), 6).alias("std_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("hour", "event_type")
    )


SQL_HOURLY_STATS = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n,
       {sql_avg('value', 6)} AS avg_value,
       {sql_std('value', 6)} AS std_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_timeslice_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 exact reference semantics: timeslice = CEILING(unix_ts/iv)*iv
    (grubbs.py:1137-1143), iv = 3600 s. Kept distinct from date_trunc —
    the reference's bucket is right-aligned."""
    ev = load(spark, sf_dir, "events")
    iv = 3600
    secs = F.expr("unix_micros(ts) DIV 1000000")
    slice_col = (F.ceil(secs / F.lit(iv)) * iv).cast("long").alias("timeslice")
    return (
        ev.groupBy(slice_col, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), exact_avg(F.col("value"), 6).alias("avg_value"))
        .orderBy("timeslice", "event_type")
    )


SQL_TIMESLICE_AVG = f"""
SELECT CAST(ceil((epoch_us(ts) // 1000000) / 3600) * 3600 AS BIGINT) AS timeslice, event_type,
       count(*) AS n,
       {sql_avg('value', 6)} AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: latest-row-per-key (`ORDER BY datum DESC LIMIT 1` per kit —
    lib/MyDB.py:392-394 and dozens more). row_number window, single
    shuffle on user_id."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", F.round("value", 4).alias("value"))
        .orderBy("user_id")
    )


SQL_LATEST_PER_USER = """
SELECT user_id, event_id, ts, event_type, round(value, 4) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


def q_static_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/W2: run-length encoding of consecutive identical values per key
    (FindStatics, scripts/FilterShow.py:362-383): ≥3 consecutive events of
    the same type for one user = a 'static run'. lag + conditional
    cumulative-sum run-id — the classic distributed RLE."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn(
            "new_run",
            F.when(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")), 1).otherwise(0),
        )
        .withColumn("run_id", F.sum("new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        runs.groupBy("user_id", "run_id", "event_type")
        .agg(F.count(F.lit(1)).alias("run_len"), F.min("ts").alias("run_start"), F.max("ts").alias("run_end"))
        .where(F.col("run_len") >= 3)
        .select("user_id", "event_type", "run_len", "run_start", "run_end")
        .orderBy("user_id", "run_start")
    )


SQL_STATIC_RUNS = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS new_run
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT *, sum(new_run) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked
)
SELECT user_id, event_type, count(*) AS run_len, min(ts) AS run_start, max(ts) AS run_end
FROM runs
GROUP BY user_id, run_id, event_type
HAVING count(*) >= 3
ORDER BY user_id, run_start
"""


def q_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: gap/restart detection — consecutive-timestamp delta per kit
    exceeding a threshold (IsRestarting, MyDatacollector.py:1207-1222).
    Gaps > 2 h between events of one user."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("gap_sec", F.expr("(unix_micros(ts) - unix_micros(prev_ts)) DIV 1000000"))
        .where(F.col("gap_sec") > 7200)
        .select("user_id", "prev_ts", "ts", "gap_sec")
        .orderBy("user_id", "ts")
    )


SQL_GAP_DETECTION = """
SELECT user_id, prev_ts, ts, gap_sec
FROM (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
         (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) // 1000000 AS gap_sec
  FROM events
)
WHERE gap_sec > 7200
ORDER BY user_id, ts
"""


def q_interval_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: sample-interval inference — mean + stddev of consecutive ts
    deltas within [60 s, 3600 s] per kit (getInterval,
    statistics/MyRegression.py:267-277)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = (
        ev.withColumn("delta", F.expr("(unix_micros(ts) - unix_micros(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) / 1000000.0"))
        .where(F.col("delta").between(60, 3600))
    )
    return (
        deltas.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_deltas"),
            exact_avg(F.col("delta"), 6).alias("avg_interval"),
            exact_std(F.col("delta"), 6).alias("std_interval"),
        )
        .orderBy("user_id")
    )


SQL_INTERVAL_INFERENCE = f"""
WITH deltas AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) / 1000000.0 AS delta
  FROM events
)
SELECT user_id, count(*) AS n_deltas,
       {sql_avg('delta', 6)} AS avg_interval,
       {sql_std('delta', 6)} AS std_interval
FROM deltas
WHERE delta BETWEEN 60 AND 3600
GROUP BY user_id
ORDER BY user_id
"""


def q_dead_kits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: dead-kit liveness — per-kit last-seen vs fleet max; dead when
    > 2 h behind (DeadKits, MyDatacollector.py:720-757). Two-level agg:
    per-key max, then a broadcast scalar of the fleet max."""
    ev = load(spark, sf_dir, "events")
    last_seen = ev.groupBy("user_id").agg(F.max("ts").alias("last_seen"))
    fleet = last_seen.agg(F.max("last_seen").alias("fleet_max"))
    return (
        last_seen.crossJoin(F.broadcast(fleet))
        .withColumn("behind_sec", F.expr("(unix_micros(fleet_max) - unix_micros(last_seen)) DIV 1000000"))
        .withColumn("dead", F.col("behind_sec") > 7200)
        .select("user_id", "last_seen", "behind_sec", "dead")
        .orderBy("user_id")
    )


SQL_DEAD_KITS = """
WITH last_seen AS (
  SELECT user_id, max(ts) AS last_seen FROM events GROUP BY user_id
)
SELECT user_id, last_seen,
       (epoch_us((SELECT max(last_seen) FROM last_seen)) - epoch_us(last_seen)) // 1000000 AS behind_sec,
       (epoch_us((SELECT max(last_seen) FROM last_seen)) - epoch_us(last_seen)) // 1000000 > 7200 AS dead
FROM last_seen
ORDER BY user_id
"""


def q_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: re-bucket to a regular hourly grid with NULL gap fill
    (Array2Units, visualisation/ChartsPM.pl:580-614): hourly averages per
    event_type left-joined onto a sequence()-generated time spine, missing
    slots stay NULL. The spine is generated, not scanned — no data skew."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"), F.date_trunc("hour", F.max("ts")).alias("t1")
    )
    spine = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type").agg(
        exact_avg(F.col("value"), 6).alias("avg_value")
    )
    return (
        grid.join(hourly, ["hour", "event_type"], "left")
        .select("hour", "event_type", "avg_value")
        .orderBy("hour", "event_type")
    )


SQL_HOURLY_GAPFILL = f"""
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1 FROM events
), spine AS (
  SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour FROM bounds
), grid AS (
  SELECT hour, event_type FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)
), hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, {sql_avg('value', 6)} AS avg_value
  FROM events GROUP BY 1, 2
)
SELECT g.hour, g.event_type, h.avg_value
FROM grid g LEFT JOIN hourly h ON g.hour = h.hour AND g.event_type = h.event_type
ORDER BY g.hour, g.event_type
"""


def q_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6: trailing 1-hour moving average per kit (moving-average weights,
    grubbs.py:1039-1074) via a RANGE window frame on event-time seconds —
    stays entirely in the JVM, one shuffle on user_id."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    # exact decimal accumulation inside the frame: order-independent and
    # identical to DuckDB's segment-tree windowed sum.
    vdec = F.round(F.col("value"), 6).cast("decimal(18,6)")
    ma = F.round(F.sum(vdec).over(w).cast("double") / F.count("value").over(w), 6)
    return (
        ev.withColumn("ma_1h", ma)
        .select("event_id", "user_id", "ts", F.round("value", 4).alias("value"), "ma_1h")
    )


SQL_MOVING_AVERAGE = """
SELECT event_id, user_id, ts, round(value, 4) AS value,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / count(value) OVER w, 6) AS ma_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q_asof_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: as-of / nearest-sample alignment join (pickValue,
    statistics/MyRegression.py:383-396): align series X ('click') with the
    mean of series Y ('purchase') in the same ±interval/2 bucket, per kit.
    Expressed as bucket-agg + equi-join so it stays a shuffle join on
    (user_id, bucket) — no O(n²) range scan."""
    ev = load(spark, sf_dir, "events")
    iv = 900
    bucket = (F.floor(F.expr("unix_micros(ts) DIV 1000000") / iv) * iv).cast("long").alias("bucket")
    x = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", bucket)
        .agg(exact_avg(F.col("value"), 6).alias("x_value"), F.count(F.lit(1)).alias("x_n"))
    )
    y = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", bucket)
        .agg(exact_avg(F.col("value"), 6).alias("y_value"))
    )
    return (
        x.join(y, ["user_id", "bucket"], "inner")
        .select("user_id", "bucket", "x_value", "x_n", "y_value")
        .orderBy("user_id", "bucket")
    )


SQL_ASOF_ALIGN = f"""
WITH x AS (
  SELECT user_id, CAST(floor((epoch_us(ts) // 1000000) / 900) * 900 AS BIGINT) AS bucket,
         {sql_avg('value', 6)} AS x_value, count(*) AS x_n
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), y AS (
  SELECT user_id, CAST(floor((epoch_us(ts) // 1000000) / 900) * 900 AS BIGINT) AS bucket,
         {sql_avg('value', 6)} AS y_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT x.user_id, x.bucket, x.x_value, x.x_n, y.y_value
FROM x JOIN y ON x.user_id = y.user_id AND x.bucket = y.bucket
ORDER BY x.user_id, x.bucket
"""


def q_mode_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: mode (most frequent value) per key with deterministic tie-break
    (ReportFailingSensors.sh:420 failing-sensor detector)."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "cnt")
        .orderBy("user_id")
    )


SQL_MODE_PER_USER = """
SELECT user_id, event_type AS mode_type, cnt
FROM (
  SELECT user_id, event_type, count(*) AS cnt,
         row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type ASC) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
ORDER BY user_id
"""


def q_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: per-sensor coverage/active test — conditional aggregation
    (`IF(count(*)=count(ISNULL(col)),'not','active')`, Get_data.pl:3113)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
            F.when(F.count(F.when(F.col("event_type") == "purchase", 1)) > 0, F.lit("active"))
            .otherwise(F.lit("not"))
            .alias("purchase_status"),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("last_purchase"),
        )
        .orderBy("user_id")
    )


SQL_COVERAGE = """
SELECT user_id,
       count(*) AS n_total,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
            THEN 'active' ELSE 'not' END AS purchase_status,
       max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def q_dedup_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 batch twin: idempotent upsert keyed on (kit, datum) — REPLACE INTO
    semantics (lib/MyARCHIVE.py:426-432). Replay the events table twice
    (simulating at-least-once delivery) and dedup latest-event_id-wins."""
    ev = load(spark, sf_dir, "events")
    replayed = ev.unionAll(ev)  # simulated duplicate delivery
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return (
        replayed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rows"), exact_sum(F.col("value"), 4).alias("sum_value"))
        .orderBy("user_id")
    )


SQL_DEDUP_UPSERT = f"""
WITH replayed AS (
  SELECT * FROM events UNION ALL SELECT * FROM events
), dedup AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM replayed
)
SELECT user_id, count(*) AS n_rows, {sql_sum('value', 4)} AS sum_value
FROM dedup WHERE rn = 1
GROUP BY user_id
ORDER BY user_id
"""


def q_sensor_set_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set difference: which event types a kit has NOT produced —
    the reference's `new ^ DBsensors` sensor-set reconciliation
    (MyDatacollector.py:1455-1461) via array_except over collect_set.
    missing_types is emitted as a comma-joined sorted string (not an
    array) so order-insensitive result canonicalizers can sort on it."""
    ev = load(spark, sf_dir, "events")
    all_types = ev.select("event_type").distinct().agg(
        F.array_sort(F.collect_set("event_type")).alias("all_types")
    )
    per_user = ev.groupBy("user_id").agg(F.array_sort(F.collect_set("event_type")).alias("has_types"))
    return (
        per_user.crossJoin(F.broadcast(all_types))
        .select(
            "user_id",
            F.concat_ws(",", F.array_sort(F.array_except("all_types", "has_types"))).alias(
                "missing_types"
            ),
            F.size("has_types").alias("n_types"),
        )
        .orderBy("user_id")
    )


SQL_SENSOR_SET_DIFF = """
WITH all_t AS (
  SELECT list_sort(list(DISTINCT event_type)) AS all_types FROM events
), per_user AS (
  SELECT user_id, list_sort(list(DISTINCT event_type)) AS has_types
  FROM events GROUP BY user_id
)
SELECT user_id,
       coalesce(array_to_string(list_sort(list_filter(all_types, t -> NOT list_contains(has_types, t))), ','), '') AS missing_types,
       len(has_types) AS n_types
FROM per_user CROSS JOIN all_t
ORDER BY user_id
"""


def q_failing_sensor_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: failing-sensor report — per kit, min/max/avg of the last 3 days
    of its series scaled x10 (ReportFailingSensors.sh:494:
    `min(round(c*10)), max(round(c*10)), round(AVG(c)*10)` over
    `datum > DATE_SUB(last, INTERVAL 3 DAY)`). Two-phase: per-kit last
    timestamp, then the range-filtered agg — one shuffle each."""
    ev = load(spark, sf_dir, "events").where(F.col("event_type") == "error")
    last = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    joined = ev.join(last, "user_id").where(
        F.unix_micros("ts") > F.unix_micros("last_ts") - F.lit(3 * 86400 * 1_000_000)
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.round(F.col("value") * 10, 0)).cast("long").alias("min_x10"),
            F.max(F.round(F.col("value") * 10, 0)).cast("long").alias("max_x10"),
            F.round(exact_avg(F.col("value"), 6) * 10, 4).alias("avg_x10"),
        )
        .orderBy("user_id")
    )


SQL_FAILING_SENSOR_REPORT = f"""
WITH last AS (
  SELECT user_id, max(ts) AS last_ts FROM events WHERE event_type = 'error' GROUP BY user_id
)
SELECT e.user_id,
       count(*) AS n,
       CAST(min(round(value * 10, 0)) AS BIGINT) AS min_x10,
       CAST(max(round(value * 10, 0)) AS BIGINT) AS max_x10,
       round({sql_avg('value', 6)} * 10, 4) AS avg_x10
FROM events e JOIN last l ON e.user_id = l.user_id
WHERE e.event_type = 'error'
  AND epoch_us(ts) > epoch_us(last_ts) - {3 * 86400 * 1_000_000}
GROUP BY e.user_id
ORDER BY e.user_id
"""


def q_wide_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-kit view generated from the long format by pivot
    (SURVEY §1.1: the reference's per-kit wide MySQL tables become
    pivoted views of the canonical long fact table). Daily grain, one
    column per field; pivot values are enumerated so Catalyst skips the
    extra distinct-scan pass."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    types = ["click", "error", "purchase", "signup", "view"]
    # exact_avg, not a hand-inlined native-round pipeline: mixing Spark's
    # round(double) with the oracle's floor-form is the documented
    # representation-edge flip class (util.py) — use the proven pair
    return (
        ev.groupBy("user_id", day)
        .pivot("event_type", types)
        .agg(exact_avg(F.col("value"), 6))
        .orderBy("user_id", "day")
    )


SQL_WIDE_VIEW = f"""
SELECT user_id, date_trunc('day', ts) AS day,
       {sql_avg("CASE WHEN event_type = 'click' THEN value END", 6)} AS click,
       {sql_avg("CASE WHEN event_type = 'error' THEN value END", 6)} AS error,
       {sql_avg("CASE WHEN event_type = 'purchase' THEN value END", 6)} AS purchase,
       {sql_avg("CASE WHEN event_type = 'signup' THEN value END", 6)} AS signup,
       {sql_avg("CASE WHEN event_type = 'view' THEN value END", 6)} AS view
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


_THROTTLE_RATE_S = 480  # Conf['rate']: 8 min between datagrams


def q_chatty_kits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the per-device throttle (IsBehavingKit,
    MyDatacollector.py:937-970): a datagram arriving < 480 s after the
    previous one from the same kit would be throttled. Reports per kit
    the would-be-dropped count and rate — the audit query an operator
    runs before tightening Conf['rate']. Streaming twin:
    streaming/state.py kit_throttle (applyInPandasWithState)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    too_fast = gap_us < _THROTTLE_RATE_S * 1_000_000
    return (
        ev.withColumn("too_fast", too_fast)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("too_fast"), 1)).alias("n_throttled"),
            F.round(F.count(F.when(F.col("too_fast"), 1)) / F.count(F.lit(1)), 6).alias(
                "throttle_rate"
            ),
        )
        .where(F.col("n_throttled") > 0)
        .orderBy(F.desc("throttle_rate"), F.asc("user_id"))
    )


SQL_CHATTY_KITS = f"""
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
          < {_THROTTLE_RATE_S * 1_000_000}) AS too_fast
  FROM events
)
SELECT user_id, count(*) AS n_events,
       count(CASE WHEN too_fast THEN 1 END) AS n_throttled,
       round(count(CASE WHEN too_fast THEN 1 END) / count(*), 6) AS throttle_rate
FROM g
GROUP BY user_id
HAVING count(CASE WHEN too_fast THEN 1 END) > 0
ORDER BY throttle_rate DESC, user_id ASC
"""


# Static-value monitor trigger table for the events corpus: event values
# quantized to 25-wide bins manufacture realistic "stuck sensor" runs;
# per-field triggers exercise the trigger-table lookup exactly like the
# sensor registry's (MyDatacollector.py:211 STATIC_TRIGGERS).
_SVM_TRIGGERS = {"click": 5, "view": 6}
_SVM_DEFAULT = 4
_SVM_BIN = 25


def q_static_value_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-graded batch twin of the streaming static-value detector
    (streaming/state.py static_value_monitor — FluctCheck,
    MyDatacollector.py:814-845): one row each time a (kit, field) run of
    identical quantized values reaches its per-field trigger. This pins
    the run-length semantics (null-reset, trigger-table lookup,
    time-ordered processing) that the applyInPandasWithState handler
    shares via the batch twin's parity pytest — the driver oracle now
    guards the whole fix class (e.g. the r5 sort-once fix).

    Scale shape: lag + two windows over (kit_id, field) — one shuffle by
    the state key, identical to the streaming state-store sharding."""
    from ..streaming.state import static_value_monitor_batch

    ev = load(spark, sf_dir, "events")
    fact = ev.select(
        F.col("user_id").cast("string").alias("kit_id"),
        F.col("event_type").alias("field"),
        "ts",
        F.floor(F.col("value") / _SVM_BIN).cast("double").alias("value"),
    )
    return static_value_monitor_batch(
        fact, triggers=_SVM_TRIGGERS, default=_SVM_DEFAULT
    ).orderBy("kit_id", "field", "ts")


def _sql_static_value_monitor() -> str:
    trig_case = "CASE field " + " ".join(
        f"WHEN '{f}' THEN {t}" for f, t in _SVM_TRIGGERS.items()
    ) + f" ELSE {_SVM_DEFAULT} END"
    return f"""
WITH fact AS (
  SELECT CAST(user_id AS VARCHAR) AS kit_id, event_type AS field, ts,
         CAST(floor(value / {_SVM_BIN}) AS DOUBLE) AS value
  FROM events
),
runs AS (
  SELECT kit_id, field, ts, value,
         CASE WHEN value IS NULL
                OR (lag(value) OVER (PARTITION BY kit_id, field ORDER BY ts)
                    IS DISTINCT FROM value)
              THEN 1 ELSE 0 END AS new_run
  FROM fact
),
rid AS (
  SELECT *, sum(new_run) OVER (PARTITION BY kit_id, field ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS run_id
  FROM runs
),
rl AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY kit_id, field, run_id ORDER BY ts) AS INT) AS run_len
  FROM rid
)
SELECT kit_id, field, ts, value, run_len
FROM rl
WHERE run_len = {trig_case}
ORDER BY kit_id, field, ts
"""


SQL_STATIC_VALUE_MONITOR = _sql_static_value_monitor()


def q_crawl_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-graded batch twin of the streaming crawl-rate monitor
    (streaming/corpus.py crawl_rate_monitor): per-source EMA of
    documents-per-batch with a 3x spike flag, warmup, and
    anomaly-EXCLUDED updates (a spike must not poison the running rate).
    Batch = hour bucket here; the recursion is path-dependent (each
    update depends on whether the PREVIOUS state called the batch
    anomalous), so the twin runs per-source sequential pandas — the same
    sanctioned escape hatch as the state handlers — and the oracle is a
    DuckDB RECURSIVE CTE over the identical float expressions (every
    literal CAST-pinned to DOUBLE so both engines walk the same IEEE
    path). Constants imported from the streaming module: one point of
    truth for the semantics the state store applies live.

    Scale shape: the per-source series is bounded by the time horizon
    (not the corpus), and sources partition the work — the same
    state-sharding argument as the streaming op."""
    from ..streaming.corpus import _RATE_ALPHA, _RATE_SPIKE, _RATE_WARMUP

    ev = load(spark, sf_dir, "events")
    batches = ev.groupBy(
        F.col("event_type").alias("source"), F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))

    def fn(pdf):
        pdf = pdf.sort_values("hour", kind="stable").reset_index(drop=True)
        ema, nb = 0.0, 0
        emas, anoms = [], []
        for n in pdf["n"]:
            n = int(n)
            warmed = nb >= _RATE_WARMUP
            anomaly = bool(warmed and ema > 0 and n > _RATE_SPIKE * ema)
            if not anomaly:
                ema = float(n) if nb == 0 else (1 - _RATE_ALPHA) * ema + _RATE_ALPHA * n
                nb += 1
            emas.append(ema)
            anoms.append(anomaly)
        pdf["ema_rate"] = emas
        pdf["anomaly"] = anoms
        return pdf[["source", "hour", "n", "ema_rate", "anomaly"]]

    out = batches.groupBy("source").applyInPandas(
        fn, "source string, hour timestamp, n long, ema_rate double, anomaly boolean"
    )
    from .util import ieee_round

    return out.select(
        "source",
        "hour",
        F.col("n").alias("n_batch"),
        ieee_round(F.col("ema_rate"), 6).alias("ema_rate"),
        "anomaly",
    ).orderBy("source", "hour")


def _sql_crawl_rate_anomalies() -> str:
    from ..streaming.corpus import _RATE_ALPHA, _RATE_SPIKE, _RATE_WARMUP
    from .util import sql_ieee_round

    spike = f"s.n_batches >= {_RATE_WARMUP} AND s.ema > 0 AND b.n > CAST({_RATE_SPIKE} AS DOUBLE) * s.ema"
    # (1.0 - alpha) computed in DOUBLE, matching Python's (1 - alpha)
    # bit-for-bit (the double nearest 0.7 differs from 1.0-0.3 in the
    # last bit — the constant must be DERIVED identically, not spelled)
    update = (
        f"(CAST(1.0 AS DOUBLE) - CAST({_RATE_ALPHA} AS DOUBLE)) * s.ema"
        f" + CAST({_RATE_ALPHA} AS DOUBLE) * b.n"
    )
    return f"""
WITH RECURSIVE idx AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS hour, count(*) AS n,
         row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('hour', ts)) AS i
  FROM events GROUP BY 1, 2
),
steps AS (
  SELECT source, hour, n, i, CAST(n AS DOUBLE) AS ema, 1 AS n_batches, FALSE AS anomaly
  FROM idx WHERE i = 1
  UNION ALL
  SELECT b.source, b.hour, b.n, b.i,
         CASE WHEN {spike} THEN s.ema ELSE {update} END AS ema,
         CASE WHEN {spike} THEN s.n_batches ELSE s.n_batches + 1 END AS n_batches,
         ({spike}) AS anomaly
  FROM steps s JOIN idx b ON b.source = s.source AND b.i = s.i + 1
)
SELECT source, hour, CAST(n AS BIGINT) AS n_batch,
       {sql_ieee_round('ema', 6)} AS ema_rate, anomaly
FROM steps
ORDER BY source, hour
"""


SQL_CRAWL_RATE_ANOMALIES = _sql_crawl_rate_anomalies()


# Compressed-clock fixture knob for the throttle twin: the synthetic
# events table is a browsing log (median per-user gap ~7 h), far too
# polite to ever trip an 8-minute datagram floor — dividing the epoch
# by 70 turns it into a plausibly-chatty sensor fleet (measured branch
# mix at sf0.01: 7659 accepted / 98 fresh throttles / 2243 penalty
# drops), exactly like _SVM_BIN manufactures stuck-sensor runs above.
# Integer division of non-negative micros is identical in Spark (DIV),
# DuckDB (//) and the recursion, so both engines walk the same clock.
_THROTTLE_CLOCK_DIV = 70


def q_kit_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-graded batch twin of the streaming per-device throttle
    (streaming/state.py kit_throttle — IsBehavingKit,
    MyDatacollector.py:937-970): running-average interval capped at
    30 min; a kit sending faster than 480 s after 3 records is dropped
    and penalized for 4 h. Path-dependent twice over — the running mean
    AND the penalty clock (a drop at t blinds the limiter until t+4h,
    and records landing inside a penalty do NOT extend it) — so the twin
    runs the shared _throttle_step sequentially per kit and the oracle
    is a DuckDB RECURSIVE CTE over the identical integer-microsecond /
    double expressions. Constants and the step function are imported
    from the streaming module: one point of truth with the live state
    handler.

    Scale shape: one shuffle on kit_id (the state store's own sharding);
    per-kit history is bounded by retention, not corpus size."""
    from ..streaming.state import kit_throttle_batch

    ev = load(spark, sf_dir, "events")
    recs = ev.select(
        F.col("user_id").cast("string").alias("kit_id"),
        "ts",
        F.expr(f"unix_micros(ts) DIV {_THROTTLE_CLOCK_DIV}").alias("epoch_us"),
    )
    out = kit_throttle_batch(recs)
    from .util import ieee_round

    return out.select(
        "kit_id",
        "ts",
        "accepted",
        ieee_round(F.col("est_interval"), 6).alias("est_interval"),
        F.col("count").alias("n"),
    ).orderBy("kit_id", "ts")


def _sql_kit_throttle() -> str:
    from ..streaming.state import (
        INTERVAL_CAP_S,
        THROTTLE_MIN_COUNT,
        THROTTLE_PENALTY_S,
        THROTTLE_RATE_S,
    )
    from .util import sql_ieee_round

    # every sub-expression mirrors _throttle_step verbatim: delta in
    # exact int micros, the running mean's parenthesization, the
    # post-update interval in the trigger test, and the elif ladder
    # (in-penalty wins and does NOT extend the penalty)
    delta = f"least(b.e_us - s.last_us, {INTERVAL_CAP_S * 1_000_000})"
    new_iv = (
        f"(s.iv * CAST(s.n AS DOUBLE)"
        f" + CAST({delta} AS DOUBLE) / CAST(1000000.0 AS DOUBLE))"
        f" / CAST(s.n + 1 AS DOUBLE)"
    )
    in_pen = "b.e_us < s.pen_us"
    trigger = (
        f"s.n >= {THROTTLE_MIN_COUNT} AND {delta} < {THROTTLE_RATE_S * 1_000_000}"
        f" AND {new_iv} < CAST({THROTTLE_RATE_S} AS DOUBLE)"
    )
    return f"""
WITH RECURSIVE idx AS (
  SELECT CAST(user_id AS VARCHAR) AS kit_id, ts,
         epoch_us(ts) // {_THROTTLE_CLOCK_DIV} AS e_us,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS i
  FROM events
),
steps AS (
  SELECT kit_id, ts, e_us, i, TRUE AS accepted,
         CAST({INTERVAL_CAP_S} AS DOUBLE) AS iv, CAST(1 AS BIGINT) AS n,
         e_us AS last_us, CAST(0 AS BIGINT) AS pen_us
  FROM idx WHERE i = 1
  UNION ALL
  SELECT b.kit_id, b.ts, b.e_us, b.i,
         CASE WHEN {in_pen} THEN FALSE WHEN {trigger} THEN FALSE ELSE TRUE END,
         {new_iv} AS iv,
         s.n + 1,
         b.e_us,
         CASE WHEN {in_pen} THEN s.pen_us
              WHEN {trigger} THEN b.e_us + {THROTTLE_PENALTY_S * 1_000_000}
              ELSE s.pen_us END AS pen_us
  FROM steps s JOIN idx b ON b.kit_id = s.kit_id AND b.i = s.i + 1
)
SELECT kit_id, ts, accepted, {sql_ieee_round('iv', 6)} AS est_interval,
       CAST(n AS BIGINT) AS n
FROM steps
ORDER BY kit_id, ts
"""


SQL_KIT_THROTTLE = _sql_kit_throttle()


# Alarm-suppression fixture: error/click events as the alarm feed, on a
# clock compressed 8x from the 2024-01-01 origin (measured at sf0.01:
# 2148 emitted / 1872 suppressed — both branches dense). The origin is a
# constant, not min(ts), so the mapping needs no extra scan and is
# identical across engines and scale factors (testdata starts 2024-01-01
# at every sf; offsets are non-negative, so DIV == // == floor).
_ALARM_CLOCK_DIV = 8
_ALARM_EPOCH0_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


def q_alarm_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-graded batch twin of the K6 notice rate limiter
    (sinks/alerts.py suppress_alarms — AlarmMessage,
    MyDatacollector.py:972-988): a repeated alarm for the same
    (kit, event) within 6 h of the last EMITTED alarm is dropped. The
    gap resets only on emitted alarms, so pass/drop is path-dependent
    (a suppressed alarm must not re-arm the window) — sequential per-key
    scan on the Spark side, RECURSIVE CTE carrying last_emit on the
    oracle side.

    Scale shape: one shuffle on (kit_id, event) — alarm feeds are tiny
    relative to the fact table (they are its exceptions)."""
    from ..sinks.alerts import suppress_alarms

    ev = load(spark, sf_dir, "events")
    alarms = ev.where(F.col("event_type").isin("error", "click")).select(
        F.col("user_id").cast("string").alias("kit_id"),
        F.col("event_type").alias("event"),
        F.timestamp_micros(
            F.expr(
                f"{_ALARM_EPOCH0_US} + (unix_micros(ts) - {_ALARM_EPOCH0_US})"
                f" DIV {_ALARM_CLOCK_DIV}"
            )
        ).alias("ts"),
    )
    return suppress_alarms(alarms).orderBy("kit_id", "event", "ts")


def _sql_alarm_suppression() -> str:
    from ..sinks.alerts import SUPPRESS_S

    s_us = SUPPRESS_S * 1_000_000
    emit = f"(epoch_us(a.ts) - epoch_us(s.last_emit)) >= {s_us}"
    return f"""
WITH RECURSIVE alarms AS (
  SELECT CAST(user_id AS VARCHAR) AS kit_id, event_type AS event,
         make_timestamp({_ALARM_EPOCH0_US}
           + (epoch_us(ts) - {_ALARM_EPOCH0_US}) // {_ALARM_CLOCK_DIV}) AS ts,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts) AS i
  FROM events WHERE event_type IN ('error', 'click')
),
steps AS (
  SELECT kit_id, event, ts, i, TRUE AS emitted, ts AS last_emit
  FROM alarms WHERE i = 1
  UNION ALL
  SELECT a.kit_id, a.event, a.ts, a.i,
         {emit} AS emitted,
         CASE WHEN {emit} THEN a.ts ELSE s.last_emit END AS last_emit
  FROM steps s JOIN alarms a ON a.kit_id = s.kit_id AND a.event = s.event
                            AND a.i = s.i + 1
)
SELECT kit_id, event, ts, emitted
FROM steps
ORDER BY kit_id, event, ts
"""


SQL_ALARM_SUPPRESSION = _sql_alarm_suppression()


def q_dead_kit_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiered liveness report — the full DeadKits escalation semantics
    (MyDatacollector.py:744-755): kits are 'ok' within 2 h of the fleet
    max, 'silent' within 24 h (first notice), 'dead' beyond (operator
    escalation). Same two-level agg + broadcast-scalar shape as
    q_dead_kits; graded separately so the tier thresholds — the part the
    reference's notice logic branches on — have their own oracle. The
    streaming twin is streaming/state.py dead_kit_report."""
    ev = load(spark, sf_dir, "events")
    last_seen = ev.groupBy("user_id").agg(F.max("ts").alias("last_seen"))
    fleet = last_seen.agg(F.max("last_seen").alias("fleet_max"))
    tier = (
        F.when(F.col("behind_sec") <= 7200, F.lit("ok"))
        .when(F.col("behind_sec") <= 86400, F.lit("silent"))
        .otherwise(F.lit("dead"))
    )
    return (
        last_seen.crossJoin(F.broadcast(fleet))
        .withColumn(
            "behind_sec",
            F.expr("(unix_micros(fleet_max) - unix_micros(last_seen)) DIV 1000000"),
        )
        .withColumn("tier", tier)
        .select("user_id", "last_seen", "behind_sec", "tier")
        .orderBy("user_id")
    )


SQL_DEAD_KIT_TIERS = """
WITH last_seen AS (
  SELECT user_id, max(ts) AS last_seen FROM events GROUP BY user_id
),
behind AS (
  SELECT user_id, last_seen,
         (epoch_us((SELECT max(last_seen) FROM last_seen)) - epoch_us(last_seen)) // 1000000 AS behind_sec
  FROM last_seen
)
SELECT user_id, last_seen, behind_sec,
       CASE WHEN behind_sec <= 7200 THEN 'ok'
            WHEN behind_sec <= 86400 THEN 'silent'
            ELSE 'dead' END AS tier
FROM behind
ORDER BY user_id
"""


def q_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide per-kit daily view stacked back into the
    long format, then per-field coverage stats — proving the §1.1 data
    model round-trips both ways (wide tables are VIEWS of the long fact
    table, never a second copy). stack() is a generator expression, no
    shuffle beyond the pivot's own aggregation."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.groupBy("user_id", day)
        .pivot("event_type", types)
        .agg(exact_avg(F.col("value"), 6))  # same engine-pair as wide_view
    )
    stack_args = ", ".join(f"'{t}', {t}" for t in types)
    long = wide.selectExpr(
        "user_id", "day", f"stack({len(types)}, {stack_args}) AS (field, daily_avg)"
    ).where(F.col("daily_avg").isNotNull())
    return (
        long.groupBy("field")
        .agg(
            F.count(F.lit(1)).alias("n_kit_days"),
            exact_avg(F.col("daily_avg"), 6).alias("avg_of_daily_avg"),
        )
        .orderBy("field")
    )


_SQL_UNPIVOT_ARMS = " UNION ALL ".join(
    f"SELECT user_id, day, '{t}' AS field, {t} AS daily_avg FROM wide"
    for t in ["click", "error", "purchase", "signup", "view"]
)

SQL_UNPIVOT_LONG = f"""
WITH wide AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         {sql_avg("CASE WHEN event_type = 'click' THEN value END", 6)} AS click,
         {sql_avg("CASE WHEN event_type = 'error' THEN value END", 6)} AS error,
         {sql_avg("CASE WHEN event_type = 'purchase' THEN value END", 6)} AS purchase,
         {sql_avg("CASE WHEN event_type = 'signup' THEN value END", 6)} AS signup,
         {sql_avg("CASE WHEN event_type = 'view' THEN value END", 6)} AS view
  FROM events GROUP BY 1, 2
),
long AS ({_SQL_UNPIVOT_ARMS})
SELECT field, count(*) AS n_kit_days,
       {sql_avg('daily_avg', 6)} AS avg_of_daily_avg
FROM long
WHERE daily_avg IS NOT NULL
GROUP BY field
ORDER BY field
"""


def q_distinct_active_kits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (absent in the reference, free in Spark —
    SURVEY §2.5): distinct active kits per field per day, the fleet
    activity report."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.countDistinct("user_id").alias("active_kits"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("day", "event_type")
    )


SQL_DISTINCT_ACTIVE_KITS = """
SELECT date_trunc('day', ts) AS day, event_type,
       count(DISTINCT user_id) AS active_kits, count(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


_SESSION_GAP_H = 6


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization per kit: a new session starts after a
    >6 h silence. Generalizes the reference's restart/gap detection
    (IsRestarting, MyDatacollector.py:1207-1222) from a boolean to full
    session assignment — lag + conditional cumsum, the batch twin of a
    streaming session window.

    One shuffle on user_id serves both window passes; the session
    roll-up is a partial-agg groupBy on (user_id, session)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    new_s = F.when(gap.isNull() | (gap > _SESSION_GAP_H * 3600 * 1_000_000), 1).otherwise(0)
    sess = (
        ev.withColumn("new_s", new_s)
        .withColumn("session", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    per_session = sess.groupBy("user_id", "session").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count(F.when(F.col("n_events") > 1, 1)).alias("multi_sessions"),
            F.max("n_events").alias("max_session_events"),
            # ieee_round: Spark round(double) disagrees with DuckDB's on
            # representation-edge values (util.ieee_round)
            ieee_round(F.sum("dur_us") / F.lit(1000000.0), 4).alias("total_session_sec"),
        )
        .orderBy("user_id")
    )


SQL_EVENT_SESSIONS = f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESSION_GAP_H * 3600 * 1_000_000}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session
  FROM g
),
per_session AS (
  SELECT user_id, session, count(*) AS n_events,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
  FROM s GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_sessions,
       count(CASE WHEN n_events > 1 THEN 1 END) AS multi_sessions,
       max(n_events) AS max_session_events,
       (floor((sum(dur_us) / 1000000.0) * 10000.0 + 0.5) / 10000.0) AS total_session_sec
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


def q_percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust distribution summary per field: exact interpolated p50/p95/p99.

    The reference's QC bands are mean±σ (grubbs.py:1119-1143) with a
    median/MAD variant (reject_outliers, grubbs.py:745-757) — p50 here IS
    that median, computed distributed. Exact percentile sorts per group;
    at 100 TB swap in approx_percentile (t-digest) — same query shape."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile(F.col("value"), F.lit(0.95)), 4).alias("p95"),
            F.round(F.percentile(F.col("value"), F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


SQL_PERCENTILE_SUMMARY = """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
"""


_MAINT_WINDOWS = [
    (0, 0, "2024-01-03", "2024-01-08"),
    (1, 1, "2024-01-08", "2024-01-15"),
    (2, 2, "2024-01-12", "2024-01-20"),
    (3, 3, "2024-01-20", "2024-01-29"),
]


def q_maintenance_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: events falling inside per-kit-group
    maintenance windows — the real-join form of the in-repair
    invalidation (P6, FilterShow.py:400-417, `TTNtable.refresh` date
    gating). Equi key (kit group) + time-range predicate: Spark plans a
    broadcast hash join on the equi part with the range as a post-filter
    — at 100 TB the date-partitioned fact table additionally prunes to
    the windows' partitions."""
    from ..io import values_df

    ev = load(spark, sf_dir, "events")
    win = values_df(
        spark,
        _MAINT_WINDOWS,
        "win_id int, user_mod int, win_start timestamp, win_end timestamp",
    )
    joined = ev.join(
        F.broadcast(win),
        (ev.user_id % 4 == win.user_mod)
        & (ev.ts >= win.win_start)
        & (ev.ts < win.win_end),
    )
    return (
        joined.groupBy("win_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_kits"),
            exact_avg(F.col("value"), 6).alias("avg_value"),
        )
        .orderBy("win_id")
    )


_SQL_MAINT_VALUES = ", ".join(
    f"({w}, {m}, TIMESTAMP '{s}', TIMESTAMP '{e}')" for w, m, s, e in _MAINT_WINDOWS
)

SQL_MAINTENANCE_WINDOW_JOIN = f"""
WITH win(win_id, user_mod, win_start, win_end) AS (VALUES {_SQL_MAINT_VALUES})
SELECT win_id, count(*) AS n_events, count(DISTINCT user_id) AS n_kits,
       {sql_avg('value', 6)} AS avg_value
FROM events JOIN win
  ON user_id % 4 = user_mod AND ts >= win_start AND ts < win_end
GROUP BY win_id
ORDER BY win_id
"""


def q_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: extract a JSON field and aggregate —
    the engine's JSON scalar surface (§2.8; the reference parses every
    payload with json.loads, MyMQTTclient.py:323-425) exercised as a
    graded query. get_json_object stays JVM-side (Jackson), no UDF."""
    ev = load(spark, sf_dir, "events")
    # try_cast, not cast: Spark 4 runs ANSI mode, so a non-integral
    # payload ('1.5', 'abc') would ERROR the whole query; try_cast
    # yields NULL, and the oracle mirrors with an integral-guard CASE
    # (DuckDB's TRY_CAST would ROUND '1.5' to 2 instead of NULLing)
    k = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            exact_avg(F.col("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
        .orderBy("event_type")
    )


SQL_PROPS_JSON_STATS = f"""
WITH e AS (
  SELECT event_type,
         CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$')
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
  FROM events
)
SELECT event_type, count(*) AS n, count(k) AS n_with_k,
       {sql_avg('k', 6)} AS avg_k,
       min(k) AS min_k, max(k) AS max_k,
       count(DISTINCT k) AS distinct_k
FROM e
GROUP BY event_type
ORDER BY event_type
"""


def q_cascade_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup cascade (the hypertable continuous-
    aggregate pattern): hourly aggregates computed from raw, daily
    computed FROM THE HOURLY PARTIALS, weekly from the daily — raw is
    scanned exactly once however many resolutions are materialized.
    At 100 TB this is the only affordable shape for dashboard
    hierarchies: each coarser level folds ~24x/7x fewer rows instead of
    rescanning the fact table per resolution.

    The DuckDB oracle recomputes every level DIRECTLY from raw, so the
    driver's hash match proves the re-aggregation is lossless — which
    holds because the inter-level representation is (scaled-int64 sum,
    count): integer sums compose associatively where rounded doubles
    would drift. This is exact_sum's two-stage argument applied across
    rollup levels.
    """
    from .util import _scaled_long

    from .util import ieee_round

    ev = load(spark, sf_dir, "events")
    # n_vals = count(value) travels with the partials: sql_avg divides by
    # count(value), not count(*) — they differ the moment value has a NULL
    hour = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("value").alias("n_vals"),
            F.sum(_scaled_long(F.col("value"))).alias("s"),
        )
    )
    day = (
        hour.groupBy(F.date_trunc("day", "bucket").alias("bucket"))
        .agg(F.sum("n_events").alias("n_events"), F.sum("n_vals").alias("n_vals"), F.sum("s").alias("s"))
    )
    week = (
        day.groupBy(F.date_trunc("week", "bucket").alias("bucket"))
        .agg(F.sum("n_events").alias("n_events"), F.sum("n_vals").alias("n_vals"), F.sum("s").alias("s"))
    )

    def finish(df: DataFrame, res: str) -> DataFrame:
        sum_d = (F.col("s").cast("decimal(38,0)") / F.lit(1000000)).cast("double")
        # ieee_round, not F.round: the oracle's sql_sum/sql_avg round via
        # the floor form — mixing forms flips last digits (~1/1800/value)
        return df.select(
            F.lit(res).alias("resolution"),
            "bucket",
            "n_events",
            ieee_round(sum_d, 4).alias("sum_value"),
            ieee_round(sum_d / F.col("n_vals"), 6).alias("avg_value"),
        )

    return (
        finish(hour, "hour")
        .unionAll(finish(day, "day"))
        .unionAll(finish(week, "week"))
        .orderBy("resolution", "bucket")
    )


def _sql_cascade_rollup() -> str:
    # every level recomputed directly from raw — hash equality with the
    # Spark cascade proves the partial re-aggregation is lossless
    def level(res: str) -> str:
        return f"""
SELECT '{res}' AS resolution, date_trunc('{res}', ts) AS bucket,
       count(*) AS n_events,
       {sql_sum('value', 4)} AS sum_value,
       {sql_avg('value', 6)} AS avg_value
FROM events
GROUP BY 2"""

    return (
        level("hour")
        + "\nUNION ALL"
        + level("day")
        + "\nUNION ALL"
        + level("week")
        + "\nORDER BY resolution, bucket"
    )


SQL_CASCADE_ROLLUP = _sql_cascade_rollup()


QUERIES: dict[str, tuple] = {
    "cascade_rollup": (q_cascade_rollup, SQL_CASCADE_ROLLUP),
    "hourly_stats": (q_hourly_stats, SQL_HOURLY_STATS),
    "event_sessions": (q_event_sessions, SQL_EVENT_SESSIONS),
    "maintenance_window_join": (q_maintenance_window_join, SQL_MAINTENANCE_WINDOW_JOIN),
    "props_json_stats": (q_props_json_stats, SQL_PROPS_JSON_STATS),
    "unpivot_long": (q_unpivot_long, SQL_UNPIVOT_LONG),
    "chatty_kits": (q_chatty_kits, SQL_CHATTY_KITS),
    "percentile_summary": (q_percentile_summary, SQL_PERCENTILE_SUMMARY),
    "failing_sensor_report": (q_failing_sensor_report, SQL_FAILING_SENSOR_REPORT),
    "distinct_active_kits": (q_distinct_active_kits, SQL_DISTINCT_ACTIVE_KITS),
    "wide_view": (q_wide_view, SQL_WIDE_VIEW),
    "timeslice_avg": (q_timeslice_avg, SQL_TIMESLICE_AVG),
    "latest_per_user": (q_latest_per_user, SQL_LATEST_PER_USER),
    "static_runs": (q_static_runs, SQL_STATIC_RUNS),
    "gap_detection": (q_gap_detection, SQL_GAP_DETECTION),
    "interval_inference": (q_interval_inference, SQL_INTERVAL_INFERENCE),
    "dead_kits": (q_dead_kits, SQL_DEAD_KITS),
    "hourly_gapfill": (q_hourly_gapfill, SQL_HOURLY_GAPFILL),
    "moving_average": (q_moving_average, SQL_MOVING_AVERAGE),
    "asof_align": (q_asof_align, SQL_ASOF_ALIGN),
    "mode_per_user": (q_mode_per_user, SQL_MODE_PER_USER),
    "coverage": (q_coverage, SQL_COVERAGE),
    "dedup_upsert": (q_dedup_upsert, SQL_DEDUP_UPSERT),
    "sensor_set_diff": (q_sensor_set_diff, SQL_SENSOR_SET_DIFF),
    "static_value_monitor": (q_static_value_monitor, SQL_STATIC_VALUE_MONITOR),
    "dead_kit_tiers": (q_dead_kit_tiers, SQL_DEAD_KIT_TIERS),
    "crawl_rate_anomalies": (q_crawl_rate_anomalies, SQL_CRAWL_RATE_ANOMALIES),
    "kit_throttle": (q_kit_throttle, SQL_KIT_THROTTLE),
    "alarm_suppression": (q_alarm_suppression, SQL_ALARM_SUPPRESSION),
}
