"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship windowed-average query at sf0.001 (smoke).
queries()    — every implemented operator from SURVEY.md §2 + the
               LLM-pipeline surface, as (spark, sf_dir) -> DataFrame.
oracle_sql() — DuckDB-equivalent SQL per query (same column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from examples_scala_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: chapter-1 windowed average (SURVEY §3.1) on sf0.001."""
    return REGISTRY["w_avg_temp"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
