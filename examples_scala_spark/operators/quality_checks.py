"""Data-quality constraint checks — the validation gate a production
pipeline runs before promoting a batch (expectations: nullability,
ranges, key uniqueness, referential integrity).

Scale design: every intra-table check is a conditional aggregate, so
ALL of a table's checks ride ONE pass over it (one scan, one partial
agg, no shuffle of fact rows — the count partials merge map-side).
Uniqueness and referential checks are the only wide ops: uniqueness is
one groupBy on the key; orphan detection is a left-anti join whose
dimension-key side the planner broadcasts while it fits (r12: no
forced hint — FK dimensions like customer scale with the corpus, and
a hard F.broadcast is honored regardless of size; AQE falls back to a
shuffled anti-join when the key set outgrows the threshold). Results
are a tiny (check, violations) table — cheap to store per batch and
diff across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _count_if(cond, name: str) -> F.Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)


def check_columns(df: DataFrame, checks: dict[str, F.Column]) -> DataFrame:
    """Run named row-level predicates (True = violation) as one
    single-pass aggregate; returns (check, violations)."""
    agg = df.agg(*[_count_if(cond, name) for name, cond in checks.items()])
    pairs = F.array(*[
        F.struct(F.lit(name).alias("check"),
                 F.col(name).alias("violations"))
        for name in checks
    ])
    return (agg.select(F.explode(pairs).alias("p"))
            .select("p.check", "p.violations"))


def check_unique(df: DataFrame, key_cols: list[str], name: str) -> DataFrame:
    """(check, violations) where violations = rows beyond the first per
    key (0 when the key is unique)."""
    dup = (df.groupBy(*key_cols).count()
           .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
                .cast("long").alias("violations")))
    return dup.select(F.lit(name).alias("check"), "violations")


def check_references(fact: DataFrame, fact_key: str, dim: DataFrame,
                     dim_key: str, name: str) -> DataFrame:
    """Orphaned foreign keys: fact rows whose key is absent from the
    dimension. The distinct dim-key side is left to the planner —
    broadcast while small, shuffled anti-join at scale (r12: the hint
    was forced, and FK dims are often SF-scaled)."""
    orphans = fact.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        on=fact_key, how="left_anti")
    return orphans.agg(F.count("*").cast("long").alias("violations")) \
        .select(F.lit(name).alias("check"), "violations")
