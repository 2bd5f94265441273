"""Time-series gap filling — the hypertable `time_bucket_gapfill` +
last-observation-carried-forward (LOCF) surface, Spark-first.

Scale shape: the observation aggregate is one map-side-combined
groupBy on (key, bucket); the dense grid is generated per key with
`sequence` (an array whose length is that key's own span — never a
global calendar cross join); the fill is a per-key ordered window.
Everything partitions by key, so 100 TB of telemetry parallelizes by
device/user with no global stage. Skewed spans (one key covering
years) surface as a long array — cap spans upstream or bucket coarser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_locf(df: DataFrame, key: str, bucket_col: str,
                  value_col: str) -> DataFrame:
    """Densify (key, bucket, value) onto each key's [min, max] bucket
    range and forward-fill missing buckets with the last observed
    value. Input must be one row per (key, bucket). Returns
    (key, bucket, v_filled, is_gap). No leading NULLs by construction
    (each key's range starts at its own first observation)."""
    rng = df.groupBy(key).agg(F.min(bucket_col).alias("__lo"),
                              F.max(bucket_col).alias("__hi"))
    grid = rng.select(
        F.col(key),
        F.explode(F.sequence("__lo", "__hi")).alias(bucket_col))
    j = grid.join(df, [key, bucket_col], "left")
    w = (Window.partitionBy(key).orderBy(bucket_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return j.select(
        F.col(key), F.col(bucket_col).cast("bigint"),
        F.last(value_col, ignorenulls=True).over(w).alias("v_filled"),
        F.col(value_col).isNull().alias("is_gap"))
