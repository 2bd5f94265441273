"""Gated external connectors (Kafka, Delta, JDBC).

The production source/sink surface for this engine. None of the
required jars ship in this container, so every builder probes for its
package first and raises a single clear error instead of a Py4J stack
trace; on a cluster with the jars present the same call just works.

At scale these are the real ingress/egress paths:
- Kafka: the streaming source (offsets in the checkpoint = S2/S5's
  replayability), partitioned by topic-partition.
- Delta: ACID sink (exactly-once without the foreachBatch committer),
  MERGE for K3-style upserts, time travel for reproducible reads.
- JDBC: the reference's Derby enrichment source (J3/J4), read once per
  micro-batch and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(ImportError):
    """The connector's jar/package is not on this cluster."""


def _has_jvm_class(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def kafka_stream(spark: SparkSession, brokers: str, topic: str,
                 starting_offsets: str = "latest") -> DataFrame:
    """Streaming Kafka source → (key, value, topic, partition, offset,
    timestamp). Requires spark-sql-kafka-0-10 on the classpath."""
    if not _has_jvm_class(
            spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"):
        raise ConnectorUnavailable(
            "Kafka connector not on classpath; launch with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>")
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def delta_table(spark: SparkSession, path: str) -> DataFrame:
    """Delta read. Requires delta-spark on the classpath + the Delta
    catalog/extension confs."""
    if not _has_jvm_class(spark, "org.apache.spark.sql.delta.DeltaLog"):
        raise ConnectorUnavailable(
            "Delta not on classpath; launch with --packages "
            "io.delta:delta-spark_2.13:<ver> and the Delta SQL extension")
    return spark.read.format("delta").load(path)


def delta_upsert_writer(path: str, key: str, order_col: str | None = None):
    """K3 — idempotent upsert sink as a foreachBatch closure: MERGE
    INTO keyed on `key`. The Delta twin of
    streaming/sinks.py:upsert_writer.

    The batch is deduped to ONE row per key before the merge: without
    it, an at-least-once batch carrying two updates for one key crashes
    MERGE with DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW, and the
    table-doesn't-exist-yet branch would persist duplicate keys that
    poison every later merge (r11 review find).

    Which row wins (r12 ADVICE fix): pass `order_col` (a sequence or
    event-time column from the stream) and the per-key max-`order_col`
    row wins — the only way to get a deterministic last-write-wins in a
    distributed batch. Without it the winner is an ARBITRARY row of the
    key's batch rows (any-one-row semantics): a micro-batch DataFrame
    has no arrival order for rows spanning partitions, and the previous
    monotonically_increasing_id().desc() tiebreak only encoded the
    partition index in its high bits — arbitrary dressed up as ordered.
    The in-memory twin's sequential dict assignment is a parallelism-1
    behavior that does not distribute; callers who care must say what
    "last" means via `order_col`."""
    def write(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        spark = batch_df.sparkSession
        if not _has_jvm_class(spark, "org.apache.spark.sql.delta.DeltaLog"):
            raise ConnectorUnavailable("Delta not on classpath")
        from delta.tables import DeltaTable  # type: ignore[import-not-found]

        order = (F.col(order_col).desc_nulls_last() if order_col
                 else F.monotonically_increasing_id().desc())
        w = Window.partitionBy(key).orderBy(order)
        b = (batch_df.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1).drop("__rn"))
        if not DeltaTable.isDeltaTable(spark, path):
            b.write.format("delta").save(path)
            return
        (DeltaTable.forPath(spark, path).alias("t")
         .merge(b.alias("s"), f"t.{key} = s.{key}")
         .whenMatchedUpdateAll()
         .whenNotMatchedInsertAll()
         .execute())
    return write


def jdbc_dim(spark: SparkSession, url: str, table: str,
             **options: str) -> DataFrame:
    """J3/J4 — the enrichment dimension (reference: Derby
    SensorLocations). Read per micro-batch, then broadcast-joined; the
    driver must have the JDBC driver jar for `url`'s scheme."""
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        # relabel ONLY genuine missing-driver failures; auth/schema/
        # network errors must surface as themselves — a blanket
        # ConnectorUnavailable sent operators chasing the classpath
        # for what was actually a bad dbtable (r11 review find)
        msg = str(e)
        if ("ClassNotFoundException" in msg
                or "No suitable driver" in msg
                or "JDBC_DRIVER" in msg):
            raise ConnectorUnavailable(
                f"JDBC driver for {url!r} not on classpath: {e}") from e
        raise
