"""Sequence packing: concatenate documents into fixed-token-budget
training sequences ("concat-and-chunk", the standard LLM pretraining
prep step).

Spark-first design: a true greedy first-fit bin-packing is inherently
sequential, so the scalable idiom — what production pipelines actually
do — is deterministic bucketing + per-bucket concatenation order +
cumulative-sum chunking:

1. Assign each doc to a bucket (deterministic function of the stable
   id; at 100 TB use enough buckets that one bucket's token mass fits
   an executor's window partition comfortably — buckets scale with
   data, so the per-partition work is bounded).
2. Within a bucket, order by id and compute the running token count
   BEFORE each doc (one window over one shuffle, partitioned by
   bucket, so every bucket packs in parallel).
3. pack_id = cum_before // budget: the pack sequence number within the
   bucket; offset = cum_before % budget is the doc's start position in
   its pack. Docs straddle pack boundaries exactly as the
   concat-then-chunk tokenizer pipeline would split them.

Everything is built-in window/aggregate expressions — no Python in the
row path, one hash-partition shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Global pack ids are bucket * 2^32 + local sequence number, so they're
# unique and stable without any global coordination.
PACK_STRIDE = 1 << 32


def pack_sequences(docs: DataFrame, budget: int = 64, n_buckets: int = 16,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Assign each document a (pack_id, offset) in a fixed token-budget
    packing. Tokens are whitespace words (swap in a real tokenizer's
    count column at will — the packing math only needs n_tokens).

    Returns (id, bucket, n_tokens, offset, pack_id) with pack_id
    globally unique; one shuffle (hash by bucket) at any scale.
    """
    t = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_buckets).alias("bucket"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
         .cast("long").alias("n_tokens"),
    )
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    # Local pack numbers live in [0, PACK_STRIDE); if a bucket ever
    # accumulates >= 2^32 packs its ids would silently collide with the
    # next bucket's range. Guard with a zero-cost expression: raise at
    # execution time rather than emit a wrong id. Sizing rule: choose
    # n_buckets >= total_tokens / (budget * 2^32) — at budget=4096
    # that's one bucket per ~16 quadrillion tokens, so any sane bucket
    # count clears it; the assert is belt-and-braces for misuse
    # (budget=1 on a giant bucket).
    local = F.expr(f"cum_before div {int(budget)}")
    return c.select(
        id_col, "bucket", "n_tokens",
        (F.col("cum_before") % budget).cast("long").alias("offset"),
        # integer div, not float: cum_before can exceed 2^53 in a hot
        # bucket at full scale and floor(double) would drop bits there
        (F.col("bucket") * PACK_STRIDE
         + F.when(local < F.lit(PACK_STRIDE), local)
            .otherwise(F.raise_error(F.lit(
                "pack_sequences: local pack id overflowed PACK_STRIDE "
                f"(2^32); raise n_buckets so each bucket holds < 2^32 "
                f"packs of budget={int(budget)}"))))
        .cast("long").alias("pack_id"),
    )
