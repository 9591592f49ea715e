"""Full-corpus replay smoke: run the reference's 132-record stress corpus
(and the per-port suites) through the batch pipeline — every record must
either decode into long-format rows or flow to the dead-letter path
without breaking the job. Skipped when the reference checkout is absent."""

import os

import pytest

CORPUS_DIR = "/root/reference/MyDatacollector/inputtests"


@pytest.mark.skipif(not os.path.isdir(CORPUS_DIR), reason="reference corpus not present")
def test_stress_corpus_replay(spark):
    from mysense_spark.streaming.pipeline import run_file_batch

    path = os.path.join(CORPUS_DIR, "stressTestData.mqtt")
    fact = run_file_batch(spark, path)
    rows = fact.collect()
    assert len(rows) > 100, "stress corpus should yield a substantial long-format table"
    # every decoded value row is typed and keyed
    for r in rows[:50]:
        assert r["kit_id"] and r["field"]
    fields = {r["field"] for r in rows}
    assert {"pm25", "pm10", "temp", "rv"} <= fields


@pytest.mark.skipif(not os.path.isdir(CORPUS_DIR), reason="reference corpus not present")
def test_port_suite_replay_decodes_all_ports(spark):
    from mysense_spark.sources.ttn import parse_envelopes
    from mysense_spark.streaming.pipeline import decode_stream, events_stream

    import pyspark.sql.functions as F

    paths = [os.path.join(CORPUS_DIR, f"inputtestP{p}.mqtt") for p in (2, 3, 4, 10, 12)]
    lines = spark.read.text(paths)
    norm = parse_envelopes(lines)
    ports = {r["port"] for r in norm.select("port").distinct().collect()}
    assert {2, 3, 4, 10, 12} <= ports
    fact = decode_stream(norm)
    per_port_rows = fact.count()
    assert per_port_rows > 0
    ev = events_stream(norm)
    assert ev.count() > 0  # port-3 meta/events side output
