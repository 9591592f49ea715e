"""mysense_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of teusH/MySense (air-quality sensor network
analytics), rebuilt Spark-first for 100 TB scale.

Reference: /root/reference (teusH/MySense @ 2026-05-15). This package is a
from-scratch design on the Spark DataFrame/SQL/Structured-Streaming stack —
not a port of the reference's Python/Perl/MySQL implementation.

Layout:
  session      — tuned SparkSession builder
  io           — table loaders for the driver's parquet star schema
  registry     — field registry, validation bounds, calibration, AQI tables
  operators/   — batch operators (SURVEY.md §2 inventory)
  sources/     — TTN/MQTT envelope normalization, LoRa payload decode
  sinks/       — upsert/HTTP-forward/alert sinks (foreachBatch)
  streaming/   — Structured Streaming pipeline + stateful operators
"""

__version__ = "0.1.0"
