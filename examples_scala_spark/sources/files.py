"""Text-format file sources/sinks: JSONL and CSV, schema-first.

Parquet is the scale format; JSONL/CSV are the interchange formats a
training-data pipeline meets at its edges (crawler dumps, annotation
exports, eval sets). Two rules keep them scale-safe:

- ALWAYS pass an explicit schema on read. Schema inference is a full
  extra pass over the data (at 100 TB, a second 100 TB scan before the
  first real job) and can silently widen types between runs.
- Treat them as ingest/egress only: land to parquet (partitioned,
  compacted — see sources/layout.py) before any heavy query. JSON/CSV
  scans can't do predicate pushdown or column pruning; every query
  over them re-parses every byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """One JSON object per line (the LLM-corpus interchange format).
    gzip keeps egress small; each output file is one task's partition,
    so `partitions` controls file count (None = keep upstream)."""
    if partitions is not None:
        df = df.repartition(partitions)
    df.write.mode("overwrite").option("compression", "gzip").json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> DataFrame:
    """Schema-first JSONL read; malformed lines land in a PERMISSIVE
    null row rather than failing the 100 TB job (switch to FAILFAST in
    validation runs)."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def write_csv(df: DataFrame, path: str, partitions: int | None = None) -> None:
    if partitions is not None:
        df = df.repartition(partitions)
    (df.write.mode("overwrite").option("header", "true")
     .option("escape", '"').option("compression", "gzip").csv(path))


def read_csv(spark: SparkSession, path: str,
             schema: T.StructType) -> DataFrame:
    return (spark.read.schema(schema).option("header", "true")
            .option("escape", '"').csv(path))


def write_orc(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """ORC egress (zlib): the columnar interchange format for Hive/
    Presto-side consumers. Like parquet it carries its own schema and
    supports predicate pushdown, so unlike JSONL/CSV it is safe to
    query in place — it's here as an EXCHANGE format for stacks
    standardized on ORC, not as a second query-side format."""
    if partitions is not None:
        df = df.repartition(partitions)
    df.write.mode("overwrite").option("compression", "zlib").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read — schema comes from the file footers (self-describing,
    no inference pass, unlike JSONL/CSV)."""
    return spark.read.orc(path)
