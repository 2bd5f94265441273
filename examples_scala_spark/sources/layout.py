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
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous SESSION may have left the managed location behind (the
    # default catalog is in-memory, the warehouse dir is not) — remove
    # it or saveAsTable fails with LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = spark._jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def write_cell_partitioned(df: DataFrame, path: str, cell_col: str) -> None:
    """Persist partitioned by a low-cardinality cell/bucket column
    (e.g. IVF cell id). A query filtering on `cell_col` scans only the
    matching directories — partition pruning."""
    df.write.mode("overwrite").partitionBy(cell_col).parquet(path)

def compact_parquet(spark: SparkSession, path: str, out_path: str,
                    target_bytes: int = 128 << 20) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(input_bytes / target_bytes) files and return that count.

    The small-files problem is the quiet killer of 100 TB pipelines:
    streaming sinks and fine-grained partitions leave thousands of
    KB-sized files, so scans pay per-file open/footer costs and the
    driver pays per-file listing/planning. Compaction restores
    ~target_bytes files (default 128 MB — one HDFS/S3-friendly block,
    matching `spark.sql.files.maxPartitionBytes` so one task reads one
    file). Uses `coalesce` (narrow, no shuffle) — file assembly moves
    bytes but never re-hashes rows; use a `repartition(col)` variant
    instead when the rewrite should also co-locate a join key."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-total // target_bytes))
    spark.read.parquet(path).coalesce(n_files) \
        .write.mode("overwrite").parquet(out_path)
    return n_files
