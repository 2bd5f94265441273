"""Storage layout helpers: bucketing and partition pruning — the two
levers that remove whole shuffle/scan stages at 100 TB.

- Bucketing pre-shuffles a table ONCE at write time: both sides of a
  repeated equi-join bucketed by the join key on the same bucket count
  join with NO Exchange (the per-query fact shuffle disappears).
- Partition pruning turns a filter on the partition column into
  directory-level file skipping (the IVF cell layout in similarity.py
  relies on this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 32, sort: bool = True) -> None:
    """Persist `df` bucketed (and optionally sorted) by `key`. Reading
    the table back exposes the bucketing to Catalyst: joins and
    aggregations on `key` skip their Exchange (and with sort=True,
    sort-merge joins skip the Sort too)."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def write_cell_partitioned(df: DataFrame, path: str, cell_col: str) -> None:
    """Persist partitioned by a low-cardinality cell/bucket column
    (e.g. IVF cell id). A query filtering on `cell_col` scans only the
    matching directories — partition pruning."""
    df.write.mode("overwrite").partitionBy(cell_col).parquet(path)
