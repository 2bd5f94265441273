"""Budgeted corpus selection: exact greedy-prefix under a weight cap.

The training-data question "take the best documents until the token
budget is spent" is a global ordered prefix — naively a single-partition
window cumsum, which is exactly the operator that does NOT survive
100 TB. The scale-correct shape is the classic two-phase top-k-by-
weight:

1. Coarsen the priority order into an integer bucket (a monotone
   function of the ordering prefix), aggregate weight per bucket —
   a TINY histogram (|buckets| rows), map-side combined.
2. Resolve the budget cut on the driver against the histogram:
   buckets strictly inside the budget are kept wholesale (a map-only
   filter — no ordering work at all), buckets past the cut are
   dropped wholesale, and ONLY the single cutoff bucket (≈1/|buckets|
   of the data) pays an exact window cumsum.

Because weights are positive, the inclusive running sum is strictly
increasing, so "keep iff inclusive-cum <= budget" IS the greedy-prefix
semantics — no skip-and-continue ambiguity, and the result is
bit-identical to the naive global window (property-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def budget_prefix_select(df: DataFrame, bucket_col: str, weight_col: str,
                         budget: float, order_cols: list) -> DataFrame:
    """Keep the greedy prefix of `df` (priority = ascending
    `bucket_col`, then `order_cols` within a bucket) whose inclusive
    running `weight_col` sum stays <= budget.

    `bucket_col` must be an integer, ordering-monotone coarsening of
    the full priority order: rows in bucket b all rank before rows in
    bucket b+1. The histogram collect is |buckets| rows — driver-safe
    at any data scale; size |buckets| so the cutoff bucket's exact
    window fits one partition (e.g. 4k buckets at 100 TB -> ~25 GB
    bucket, repartitioned below if needed).
    """
    hist = (df.groupBy(bucket_col).agg(F.sum(weight_col).alias("__w"))
            .collect())
    hist.sort(key=lambda r: r[bucket_col])
    cum = 0.0
    full: list = []
    cutoff = None
    spent_before = 0.0
    for r in hist:
        if cum + r["__w"] <= budget:
            full.append(r[bucket_col])
            cum += r["__w"]
        else:
            cutoff = r[bucket_col]
            spent_before = cum
            break
    sel = df.filter(F.col(bucket_col).isin(full)) if full else df.limit(0)
    if cutoff is not None:
        w = (Window.orderBy(*order_cols)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        part = (df.filter(F.col(bucket_col) == cutoff)
                .withColumn("__cum", F.sum(weight_col).over(w))
                .filter(F.col("__cum") + F.lit(spent_before) <= budget)
                .drop("__cum"))
        sel = sel.unionByName(part)
    return sel
