"""Time-series operators: gap filling (hypertable
`time_bucket_gapfill` + LOCF), CUSUM drift detection, and closed-form
per-key OLS trend lines.

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

def cusum_flags(df: DataFrame, key: str, order_cols: list,
                value_units: F.Column, target_units: F.Column,
                slack_units: int, h_units: int) -> DataFrame:
    """One-sided (upper) CUSUM change detection per key, expressed as
    a distributed scan instead of the textbook sequential recursion.

    S_i = max(0, S_{i-1} + x_i - (target + slack)) has the closed form
    S_i = P_i - min_{j<=i} P_j over the prefix sums P of the excess
    (x - target - slack) — so one per-key ordered window computes the
    whole statistic: a running SUM and a running MIN over the same
    frame. Everything runs in integer units supplied by the caller
    (e.g. half-cents), so partial-order effects cannot move a value
    across the `> h` threshold on any engine.

    Scale: one shuffle on `key`; windows never leave the key
    partition. The reference's keyed-process-function version of this
    (chapter7 KeyedStateFunction) holds S in per-key state; this is
    the batch/replay twin with identical arithmetic.

    Returns df + (cusum_units, drift) where drift = cusum > h.
    """
    w = (Window.partitionBy(key).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    excess = (value_units - target_units - F.lit(slack_units)).cast("long")
    p = F.sum(excess).over(w)
    d = df.withColumn("__p", p)
    wm = (Window.partitionBy(key).orderBy(*order_cols)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # S_i = P_i - min(0, min_{j<=i} P_j): the empty prefix contributes
    # P_0 = 0, which the least() against 0 restores.
    cusum = F.col("__p") - F.least(F.lit(0).cast("long"),
                                   F.min("__p").over(wm))
    return (d.withColumn("cusum_units", cusum.cast("long"))
            .withColumn("drift", F.col("cusum_units") > F.lit(h_units))
            .drop("__p"))


def ols_trend(df: DataFrame, key: str, x_col: F.Column,
              y_units: F.Column) -> DataFrame:
    """Per-key least-squares trend line from the five classical sums —
    the single-pass, shuffle-once form of regr_slope/regr_intercept.

    n, Sx, Sy, Sxy, Sxx accumulate as exact DECIMAL(38,0) integers
    (caller supplies integer x and integer y units), so the slope
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
    divides two exact integers — associativity of the reduce cannot
    change the result, which is what makes the output hash-stable
    across engines. One map-side-combined groupBy on `key`; nothing
    else shuffles. Keys with < 2 points or zero x-variance yield NULL
    slope/intercept.

    Returns (key, n, slope, intercept) with slope/intercept rounded
    to 9/6 dp, in units of y_units per x_col unit.
    """
    d38 = "decimal(38,0)"
    d = df.select(F.col(key),
                  x_col.cast(d38).alias("__x"),
                  y_units.cast(d38).alias("__y"))
    g = d.groupBy(key).agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"))
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(det != 0, num.cast("double") / det.cast("double"))
    intercept = F.when(det != 0,
                       (F.col("sy") * F.col("sxx")
                        - F.col("sx") * F.col("sxy")).cast("double")
                       / det.cast("double"))
    return g.select(F.col(key), F.col("n").cast("bigint").alias("n"),
                    F.round(slope, 9).alias("slope"),
                    F.round(intercept, 6).alias("intercept"))
