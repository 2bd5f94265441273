"""Distributed ordered prefix sum — the global-scan primitive.

Cumulative metrics over a total order (Pareto shares, running totals,
budget curves) are a single-partition window in the naive form — the
op that dies first at 100 TB. The scalable shape is the classic
three-step scan (the terasort pattern):

1. range-repartition on the order key + sort within partitions, then
   MATERIALIZE (localCheckpoint): the range partitioner samples its
   boundaries, so without pinning them the two downstream jobs could
   see different partitionings and the offsets would lie.
2. per-partition totals -> driver (P values — driver-safe at any data
   size) -> exclusive offsets per partition.
3. one Arrow pass (mapInPandas): within-partition running sum plus
   the partition's offset. Batches of one partition arrive in sorted
   order, so a running accumulator across batches is exact.

Weights are INTEGER by contract: integer addition is associative and
order-free, so the partials computed by Spark's tree aggregation and
the sequential pandas cumsum agree bit-for-bit with any reference
implementation (floats would differ in the last ulp depending on
addition order). Callers with money-like decimals scale to integer
units first (e.g. cents).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ordered_prefix_sum(df: DataFrame, order_cols: list, weight_col: str,
                       out_col: str = "cum",
                       partitions: int = 32) -> DataFrame:
    """Inclusive running sum of integer `weight_col` over the global
    ordering `order_cols`. Adds `out_col` (long); row set unchanged."""
    base = (df.repartitionByRange(partitions, *order_cols)
            .sortWithinPartitions(*order_cols)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=False))
    totals = {r["__pid"]: r["t"] for r in
              base.groupBy("__pid")
              .agg(F.sum(weight_col).cast("long").alias("t")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    from pyspark.sql.types import LongType, StructField, StructType
    # note: StructType.add MUTATES the instance — and DataFrame.schema
    # is cached, so adding to it in place corrupts `base`'s own column
    # list. Build a fresh StructType instead.
    out_schema = StructType(
        list(base.schema.fields) + [StructField(out_col, LongType())])

    def add_cum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None
        for pdf in batches:
            if not len(pdf):
                continue
            if run is None:
                run = bc.value[int(pdf["__pid"].iloc[0])]
            cs = pdf[weight_col].astype("int64").cumsum() + run
            run = int(cs.iloc[-1])
            out = pdf.copy()
            out[out_col] = cs
            yield out

    return base.mapInPandas(add_cum, out_schema).drop("__pid")
