"""Generic CDC apply: merge a changelog into a keyed snapshot —
`MERGE INTO` semantics as pure DataFrame ops, for stores that aren't a
transactional table format. (minhash_delta in dedup.py is this
pattern specialized to signature tables.)

Scale shape: the changelog collapses to one row per key (last write
wins by the event order) with ONE window over the changelog — work is
changelog-sized. The snapshot — the 100 TB side — is touched by a
single keyed anti-join; when the changed-key set is broadcastable the
snapshot never shuffles at all, and when it isn't, Catalyst falls back
to a shuffle anti-join on the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(snapshot: DataFrame, changes: DataFrame, key: str,
                    order_cols: list[str], op_col: str = "op",
                    broadcast_keys: bool = True) -> DataFrame:
    """Apply (key, op in {'upsert','delete'}, payload..., order...) to a
    keyed snapshot; returns the new snapshot with the snapshot's
    columns.

    Last-write-wins per key by `order_cols` (ties must be broken by a
    unique column — include one). A key whose final entry is a delete
    disappears; otherwise the final upsert's payload replaces (or
    inserts) the row.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    latest = (changes
              .withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .drop("__rn"))
    changed_keys = latest.select(key)
    if broadcast_keys:
        changed_keys = F.broadcast(changed_keys)
    kept = snapshot.join(changed_keys, on=key, how="left_anti")
    upserts = (latest.filter(F.col(op_col) == "upsert")
               .select(*snapshot.columns))
    return kept.unionByName(upserts)


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  value_cols: list[str]) -> DataFrame:
    """Emit the changelog that turns snapshot `old` into snapshot
    `new`: (key, op in {'insert','update','delete'}, old_*, new_*).
    Unchanged keys are dropped. The inverse of apply_changelog — the
    two compose to a round-trip (tested), which is how a pipeline
    derives an incremental feed from full-table drops when the source
    system has no CDC.

    Scale shape: one full outer sort-merge join on the key — both
    snapshots shuffle once, which is the information-theoretic minimum
    for a diff of unsorted tables (bucketed layouts on `key` remove
    even that; see sources/layout.py:write_bucketed)."""
    # explicit presence markers: NULL value columns must not be read
    # as absence
    o = old.select(key, F.lit(True).alias("__in_old"),
                   *[F.col(c).alias(f"old_{c}") for c in value_cols])
    n = new.select(key, F.lit(True).alias("__in_new"),
                   *[F.col(c).alias(f"new_{c}") for c in value_cols])
    j = o.join(n, key, "full_outer")
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    op = (F.when(F.col("__in_old").isNull(), "insert")
          .when(F.col("__in_new").isNull(), "delete")
          .when(changed, "update"))
    return (j.withColumn("op", op).filter(F.col("op").isNotNull())
            .select(key, "op",
                    *[f"old_{c}" for c in value_cols],
                    *[f"new_{c}" for c in value_cols]))
