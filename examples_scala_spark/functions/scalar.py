"""Scalar function surface (SURVEY §2.11) — thin, named wrappers over
pyspark.sql.functions so every scalar the reference uses has a
discoverable, tested home. All JVM expressions (codegen'd)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fahrenheit_to_celsius_col(col) -> Column:
    """(t - 32) * 5/9 — reference chapter1/AverageSensorReadings.scala:51."""
    return (_c(col) - 32.0) * (5.0 / 9.0)


def celsius_to_fahrenheit_col(col) -> Column:
    return _c(col) * (9.0 / 5.0) + 32.0


def iso_datetime(ts_col, millis: bool = False) -> Column:
    """TimestampType → ISO-8601 seconds string, the reference's output
    formatting (chapter8/TransactionalSinkExample.scala:83-85). For an
    epoch-MS BIGINT column (the sensor tables' `timestamp`), pass
    millis=True — a bare numeric column fed to date_format is either
    rejected under ANSI or coerced as epoch-SECONDS, rendering
    1704067200000 ms as a year-55xxx date (r11 review find). Assumes
    UTC session timezone (set by session.tune)."""
    c = F.timestamp_millis(_c(ts_col).cast("long")) if millis \
        else _c(ts_col)
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")


def floor_to_bucket(ts_ms_col, bucket_ms: int) -> Column:
    """ts - (ts % size) — the reference's manual window arithmetic
    (chapter6/CustomWindow.scala:67)."""
    return _c(ts_ms_col) - (_c(ts_ms_col) % F.lit(bucket_ms))


def epoch_seconds(ts_col) -> Column:
    """TimestampType → BIGINT epoch seconds (engine-neutral output)."""
    return _c(ts_col).cast("long")
