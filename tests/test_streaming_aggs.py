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
