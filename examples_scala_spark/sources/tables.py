"""Parquet table loaders for the driver testdata star schema + events.

At 100 TB these reads are the critical path: keep them as bare
`spark.read.parquet` scans so Catalyst's vectorized parquet reader,
predicate pushdown, and column pruning all apply. Do NOT cache or
materialize here — each query selects only the columns it needs and the
scan should show a pruned ReadSchema in `explain`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimensions small enough to broadcast at EVERY scale factor (TPC-H dims
# scale sublinearly or not at all): always broadcast-join these.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) → read as BIGINT nanos
        # (spark.sql.legacy.parquet.nanosAsLong) and restore a
        # TimestampType column; values are micro-aligned so div 1000 is
        # exact.
        from pyspark.sql.types import LongType
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def sensor_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's primary fixture (SensorReading: id, timestamp,
    temperature — reference util/SensorReading.scala:19) viewed over the
    driver `events` table per FIXTURES.md §1.

    Mapping: id = 'sensor_' || (user_id % 10 + 1), event time = ts,
    temperature = value. Keeps both a TimestampType `ts` (required by
    window()/withWatermark) and an epoch-ms BIGINT `timestamp` for
    parity with the reference's Long timestamps.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.concat(F.lit("sensor_"), ((F.col("user_id") % 10) + 1).cast("string")).alias("id"),
        F.col("ts"),
        F.expr("unix_micros(ts) div 1000").alias("timestamp"),
        F.col("value").alias("temperature"),
        F.col("event_id"),
    )


# DuckDB twin of sensor_readings() for use inside oracle SQL strings.
SENSOR_READINGS_SQL = (
    "SELECT 'sensor_' || ((user_id % 10) + 1)::VARCHAR AS id, "
    "ts, "
    "(epoch_us(ts) // 1000) AS timestamp, "
    "value AS temperature, "
    "event_id "
    "FROM events"
)
