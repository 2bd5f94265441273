"""Synthetic sensor sources — Spark twins of the reference generators.

Reference: util/SensorSource.scala:34-74 (10 sensors per subtask, one
reading per sensor per 100 ms, Gaussian random-walk temperature starting
at 65±20°F) and util/ResettableSensorSource.scala:38-134 (deterministic,
replayable variant).

Spark-first design: the *streaming* twin is the built-in `rate`
source (offsets checkpointed → replayable for free, which is all of
S2/S5's CheckpointedFunction machinery; swap in `rate-micro-batch`
when fixed per-batch contents matter too); columns are pure functions
of (value, timestamp) so replay is deterministic. The *batch* twin
generates the same shape with `spark.range` — fully parallel, no
driver-side data, so it scales to any row count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_UM = 1 << 24  # hash -> unit-interval resolution


def _unit(col, salt: int) -> F.Column:
    """Uniform (0,1) as a PURE function of the column: hash -> 24-bit
    bucket, +0.5 so the open interval excludes exact 0/1 (log-safe)."""
    return (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(_UM)) + 0.5) \
        / float(_UM)


def _gauss(col, salt: int) -> F.Column:
    """Standard normal as a pure function of the column (Box-Muller
    over two hash-derived uniforms). F.randn is NOT usable here: it
    seeds per PARTITION and draws in row order, so the same `value`
    gets a different temperature under a different partition layout —
    exactly the replay-determinism the module contract promises
    (r11 review find)."""
    u1, u2 = _unit(col, salt), _unit(col, salt + 7919)
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)


def _with_sensor_columns(df: DataFrame, num_sensors: int, seed: int) -> DataFrame:
    # Deterministic pseudo-random walk: temperature = 65 + 20*gauss0 +
    # hash-derived ±steps scaled by sqrt(reading index) — every column
    # a pure function of `value`, so any replay (different partition
    # count, restarted stream, different cluster) reproduces the row.
    v = F.col("value")
    sensor = ((v % num_sensors) + 1).cast("string")
    step = (v / num_sensors).cast("long")  # reading index per sensor
    return df.select(
        F.concat(F.lit("sensor_"), sensor).alias("id"),
        F.col("timestamp").alias("ts"),
        F.expr("unix_micros(timestamp) div 1000").alias("timestamp"),
        (
            F.lit(65.0)
            + _gauss(v, seed) * 20.0
            + _gauss(v, seed + 1) * 0.5 * F.sqrt(step.cast("double") + 1.0)
        ).alias("temperature"),
    )


def sensor_source_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    num_sensors: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Unbounded sensor stream (S1 twin). 100 rows/s default matches the
    reference cadence (10 sensors x 10 Hz, SensorSource.scala:53-64)."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return _with_sensor_columns(raw, num_sensors, seed)


def sensor_source_batch(
    spark: SparkSession,
    num_rows: int = 10_000,
    num_sensors: int = 10,
    seed: int = 42,
    start_ts: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Bounded deterministic twin (S2/S6): same schema, same cadence
    (100 ms between readings of one sensor), generated distributed via
    spark.range — no driver-side materialization at any scale."""
    raw = spark.range(num_rows).select(
        F.col("id").alias("value"),
        (
            F.to_timestamp(F.lit(start_ts))
            + F.make_interval(secs=(F.col("id") / (10.0 * num_sensors)))
        ).alias("timestamp"),
    )
    return _with_sensor_columns(raw, num_sensors, seed)


def smoke_level_stream(spark: SparkSession, seed: int = 42) -> DataFrame:
    """S3 twin: 1 event/s control stream, 'High' with p≈0.21
    (reference chapter5/util/SmokeLevelSource.scala:41-47:
    gaussian > 0.8 → High)."""
    raw = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    return raw.select(
        F.col("timestamp").alias("ts"),
        # hash-pure gaussian (not randn) for the same replay-
        # determinism reason as the sensor columns
        F.when(_gauss(F.col("value"), seed) > 0.8, "High")
         .otherwise("Low").alias("level"),
    )


def count_source_stream(spark: SparkSession, rows_per_second: int = 10_000) -> DataFrame:
    """S4/S5 twin: monotonically increasing counter. Replayability
    (reference chapter8/SourceFunctionExample.scala:42-81's ListState
    offset tracking) is intrinsic: rate-source offsets live in the
    streaming checkpoint."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(F.col("value"), F.col("timestamp").alias("ts"))
    )
