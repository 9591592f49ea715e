"""Streaming windowed aggregation + stateful static monitor: real
readStream runs compared against their batch twins."""

import datetime as dt


def _fact_rows():
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(50):
        rows.append(("kitA", "pm25", base + dt.timedelta(minutes=7 * i), float(10 + i % 5)))
        rows.append(("kitB", "temp", base + dt.timedelta(minutes=11 * i), 21.5))
    return rows


def test_hourly_stats_stream_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from mysense_spark.streaming.pipeline import hourly_stats_stream

    src = tmp_path / "fact"
    schema = "kit_id string, field string, ts timestamp, value double"
    spark.createDataFrame(_fact_rows(), schema).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    got = []
    q = (
        hourly_stats_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        spark.read.parquet(str(src))
        .groupBy(F.window("ts", "1 hour").alias("win"), "kit_id", "field")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .select(F.col("win.start").alias("hour"), "kit_id", "field", "n", "avg_value", "min_value", "max_value")
        .collect()
    )
    # append mode only emits windows older than the watermark; every
    # emitted window must exactly match its batch twin
    bkey = {(r["hour"], r["kit_id"], r["field"]): (r["n"], r["avg_value"]) for r in batch}
    assert len(got) > 0
    for r in got:
        assert bkey[(r["hour"], r["kit_id"], r["field"])] == (r["n"], r["avg_value"])


def test_static_monitor_stream_matches_batch_twin(spark, tmp_path):
    from mysense_spark.streaming.state import static_value_monitor, static_value_monitor_batch

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(25):  # temp trigger = 20
        rows.append(("kitS", "temp", base + dt.timedelta(minutes=i), 21.5))
    for i in range(12):  # default trigger = 10 (unknown field)
        rows.append(("kitS", "gasx", base + dt.timedelta(minutes=i), 7.0))
    schema = "kit_id string, field string, ts timestamp, value double"
    src = tmp_path / "static_src"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    got = []
    q = (
        static_value_monitor(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "static_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = static_value_monitor_batch(spark.read.parquet(str(src))).collect()
    skey = {(r["kit_id"], r["field"], r["run_len"]) for r in got}
    bkey = {(r["kit_id"], r["field"], r["run_len"]) for r in batch}
    assert skey == bkey
    assert ("kitS", "temp", 20) in skey
    assert ("kitS", "gasx", 10) in skey


def _gappy_rows():
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # kitA: three bursts separated by >2h silences -> 3 sessions
    for off_h, n in [(0, 4), (5, 2), (12, 3)]:
        for i in range(n):
            rows.append(
                ("kitA", "pm25", base + dt.timedelta(hours=off_h, minutes=10 * i), 10.0 + i)
            )
    # kitB: one lone event -> 1 singleton session
    rows.append(("kitB", "temp", base + dt.timedelta(hours=1), 21.5))
    return rows


def test_session_window_stream_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from mysense_spark.streaming.pipeline import session_stats_stream

    src = tmp_path / "fact"
    schema = "kit_id string, field string, ts timestamp, value double"
    spark.createDataFrame(_gappy_rows(), schema).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    got = []
    q = (
        session_stats_stream(stream, gap="2 hours")
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # append mode only emits sessions the watermark has CLOSED: the last
    # kitA session (ends at max event time) stays in state — correct
    # streaming semantics, so compare against the closed subset.
    import datetime as dt

    rows = spark.read.parquet(str(src))
    max_ts = rows.agg(F.max("ts")).first()[0]
    horizon = max_ts - dt.timedelta(hours=2)
    batch = (
        rows.groupBy(F.session_window("ts", "2 hours").alias("win"), "kit_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "kit_id",
            "n_events",
            "avg_value",
        )
        .where(F.col("session_end") <= F.lit(horizon))
        .collect()
    )
    key = lambda r: (r.kit_id, r.session_start)
    assert sorted(got, key=key) == sorted(batch, key=key)
    per_kit = {}
    for r in got:
        per_kit.setdefault(r.kit_id, []).append(r.n_events)
    # kitA's first two bursts (4 and 2 events) are closed; the third is
    # still open in state. kitB's singleton closed long ago.
    assert sorted(per_kit["kitA"]) == [2, 4]
    assert per_kit["kitB"] == [1]


def test_session_window_agrees_with_lag_cumsum(spark, tmp_path):
    """The batch `event_sessions` method (lag + conditional cumsum) and
    Spark's native session_window must assign identical session counts
    when the gap semantics line up (session_window splits at >= gap,
    the lag method at > gap; no fixture delta equals the gap exactly)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    schema = "kit_id string, field string, ts timestamp, value double"
    df = spark.createDataFrame(_gappy_rows(), schema)

    native = (
        df.groupBy(F.session_window("ts", "2 hours"), "kit_id")
        .count()
        .groupBy("kit_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    w = Window.partitionBy("kit_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    manual = (
        df.withColumn(
            "new_s",
            F.when(gap_us.isNull() | (gap_us > 2 * 3600 * 1_000_000), 1).otherwise(0),
        )
        .groupBy("kit_id")
        .agg(F.sum("new_s").alias("n_sessions"))
    )
    assert sorted(native.collect()) == sorted(manual.collect())
