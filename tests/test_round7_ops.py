"""Round-7 additions: session/sliding window semantics, suffix-array
ExactSubstr, KLL sketch, cross-encoder rerank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _ts_df(spark, rows):
    """rows: (id, epoch_seconds_float, temperature)."""
    df = spark.createDataFrame(rows, "id string, t double, temperature double")
    return df.select(
        "id", F.timestamp_micros((F.col("t") * 1_000_000).cast("long")).alias("ts"),
        "temperature")


class TestSessionWindowSemantics:
    """Pin Spark's session merge rule (the one the w_session_stats
    oracle mirrors): consecutive events with diff <= gap merge (the
    boundary diff == gap MERGES — measured, not assumed); only
    diff > gap starts a new session."""

    def test_gap_boundary_inclusive_merge(self, spark):
        gap = 10
        df = _ts_df(spark, [("a", 0.0, 1.0), ("a", 9.999999, 2.0),
                            ("a", 30.0, 3.0), ("a", 40.0, 4.0)])
        out = (df.groupBy(F.session_window("ts", f"{gap} seconds"), "id")
               .count()
               .select(F.unix_micros("session_window.start").alias("s"),
                       F.unix_micros("session_window.end").alias("e"),
                       "count")
               .orderBy("s").collect())
        # 9.999999 within 0+10 merges; 30.0 > 9.999999+10 => new
        # session; 40.0 == 30+10 boundary => MERGES (end extends to 50)
        assert [(r.s, r.e, r["count"]) for r in out] == [
            (0, 19_999_999, 2),
            (30_000_000, 50_000_000, 2),
        ]

    def test_keys_do_not_merge_across(self, spark):
        df = _ts_df(spark, [("a", 0.0, 1.0), ("b", 1.0, 2.0)])
        out = (df.groupBy(F.session_window("ts", "10 seconds"), "id")
               .count().collect())
        assert len(out) == 2

    def test_equal_timestamps_one_session(self, spark):
        df = _ts_df(spark, [("a", 5.0, 1.0), ("a", 5.0, 2.0)])
        out = (df.groupBy(F.session_window("ts", "10 seconds"), "id")
               .count().collect())
        assert len(out) == 1 and out[0]["count"] == 2


class TestSlidingWindowSemantics:
    def test_each_event_in_size_over_slide_windows(self, spark):
        df = _ts_df(spark, [("a", 3601.5, 1.0)])
        out = (df.groupBy(F.window("ts", "1 hour", "15 minutes"), "id")
               .count()
               .select(F.col("window.start").cast("long").alias("s"))
               .orderBy("s").collect())
        # starts: floor(3601.5/900)*900 - k*900 for k in 0..3
        assert [r.s for r in out] == [900, 1800, 2700, 3600]

    def test_boundary_event_not_in_expired_window(self, spark):
        # an event at exactly t=3600 is NOT in window [0, 3600)
        df = _ts_df(spark, [("a", 3600.0, 1.0)])
        out = (df.groupBy(F.window("ts", "1 hour", "15 minutes"), "id")
               .count()
               .select(F.col("window.start").cast("long").alias("s"))
               .orderBy("s").collect())
        assert [r.s for r in out] == [900, 1800, 2700, 3600]
