"""Stratified reservoir sampling as a mergeable two-stage accumulator.

Semantics: exactly min(k, |stratum|) rows per stratum, chosen as the k
smallest salted-md5 hashes of the stable id ("bottom-k by hash" — the
mergeable, deterministic formulation of reservoir sampling: the union
of two strata samples' candidate sets always contains the combined
bottom-k, so partial results merge exactly, and the same rows are
chosen under retries, repartitioning, and data-order changes, where a
classic random reservoir is none of those).

Scale design: stage 1 prunes candidates per input partition with an
Arrow-batched accumulator (mapInPandas) that keeps only the k smallest
hashes per stratum seen in that partition — the shuffle that follows
carries at most k * num_partitions * num_strata rows, independent of
table size. Stage 2 takes the exact global bottom-k per stratum with
one window over that tiny candidate set. The big table itself is never
shuffled.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import units6


def _hash_col(id_col: str, salt: str) -> F.Column:
    # same idiom as the hash-split / importance samplers: first 15 hex
    # digits of a salted md5 as a uniform BIGINT in [0, 2^60)
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + "-"), F.col(id_col).cast("string"))),
        1, 15), 16, 10).cast("bigint"))


def stratified_reservoir(df: DataFrame, stratum_col: str, k: int,
                         id_col: str, salt: str = "rsv") -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum: (stratum, id, rnk)
    with rnk in 1..k ordered by the sampling hash.

    Stage 1 (mapInPandas, per input partition): keep the k smallest
    (hash, id) per stratum — a superset of the global answer by the
    bottom-k merge property. Stage 2: exact row_number over the
    pruned candidates.
    """
    hashed = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("sid"),
        _hash_col(id_col, salt).alias("u"),
    )
    schema = hashed.schema

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            both = pdf if acc is None else pd.concat((acc, pdf))
            # nsmallest per stratum on (u, sid); k+ties don't matter —
            # stage 2 re-ranks exactly. dropna=False: a NULL stratum is
            # its own partition (matches the window + SQL oracle).
            acc = (both.sort_values(["u", "sid"])
                   .groupby("stratum", sort=False, dropna=False).head(k))
        yield acc if acc is not None else pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in schema.fields})

    candidates = hashed.mapInPandas(prune, schema)
    w = Window.partitionBy("stratum").orderBy("u", "sid")
    return (candidates
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(F.col("stratum").alias(stratum_col),
                    F.col("sid").alias(id_col),
                    F.col("rnk").cast("long").alias("rnk")))


def weighted_reservoir(df: DataFrame, stratum_col: str, k: int,
                       id_col: str, weight_col: str,
                       salt: str = "wrsv") -> DataFrame:
    """Weighted sampling without replacement, k per stratum
    (Efraimidis–Spirakis by exponential clocks): each row draws
    key = -ln(U)/w from its deterministic salted-hash uniform U, and
    the k SMALLEST keys win — P(row in sample) rises with weight
    exactly as sequential weighted draws would give. Same mergeable
    bottom-k structure as stratified_reservoir, so the same two-stage
    plan applies: per-partition Arrow pruning, then one exact window
    over <= k * partitions * strata candidates; the corpus never
    shuffles. Deterministic under retries/appends (rand() is neither).

    Key ties need bit-identical doubles across engines for the oracle;
    with 60-bit hashes the nearest-key gap is ~2^-60 relative, far
    above double rounding, and id breaks exact ties.
    """
    two60 = float(1 << 60)
    u_unit = (_hash_col(id_col, salt).cast("double") + 1.0) / two60
    key = -F.log(u_unit) / F.col(weight_col).cast("double")
    hashed = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("sid"),
        key.alias("u"),
    )
    schema = hashed.schema

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            both = pdf if acc is None else pd.concat((acc, pdf))
            # dropna=False: NULL stratum is its own partition (oracle
            # and the stage-2 window both treat it that way)
            acc = (both.sort_values(["u", "sid"])
                   .groupby("stratum", sort=False, dropna=False).head(k))
        yield acc if acc is not None else pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in schema.fields})

    candidates = hashed.mapInPandas(prune, schema)
    w = Window.partitionBy("stratum").orderBy("u", "sid")
    return (candidates
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(F.col("stratum").alias(stratum_col),
                    F.col("sid").alias(id_col),
                    F.col("rnk").cast("long").alias("rnk")))


def shuffle_shards(df: DataFrame, id_col: str, n_shards: int = 64,
                   seed: str = "seed0") -> DataFrame:
    """Deterministic global shuffle into training shards:
    (id, shard, pos) — the order a data loader should read.

    key = md5(id || seed) gives a uniform pseudorandom total order
    that is stable under retries, repartitioning, and engine choice
    (no rand(), which breaks replay); shard = 60-bit prefix mod
    n_shards; pos = rank within the shard by (key, id). Changing the
    seed produces an independent permutation — epoch shuffling is
    seed rotation, zero state.

    Scale shape: one hash-partition shuffle on shard + a per-shard
    local sort (the terasort shape). Each shard sorts in ONE task, so
    pick n_shards ~ data_size / task_budget (100 TB / 1 GB -> ~100k
    shards); pos never needs a global window."""
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"),
        F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy("key", id_col)
    return (df.select(F.col(id_col), key.alias("key"),
                      shard.alias("shard"))
            .withColumn("pos", F.row_number().over(w).cast("bigint"))
            .select(id_col, "shard", "pos"))


def stratified_split_exact(df: DataFrame, stratum_col: str, id_col: str,
                           total_k: int, salt: str = "alloc") -> DataFrame:
    """Proportional stratified sample with an EXACT global size:
    largest-remainder (Hamilton) allocation distributes `total_k` over
    strata proportionally to their counts — integer arithmetic only
    (base = total_k*n_i div N, remainders ranked), so the allocation
    is engine-reproducible, then each stratum takes its bottom-k_i by
    the deterministic sampling hash via stratified_reservoir's
    mergeable two-stage plan (the corpus never shuffles). Exact total
    whenever total_k <= N and no stratum is allocated past its size.
    Returns (stratum, id, rnk <= k_i)."""
    from pyspark.sql.types import LongType, StructField, StructType

    rows = df.groupBy(F.col(stratum_col).alias("stratum")) \
             .agg(F.count("*").alias("n_i")).collect()
    N = sum(r["n_i"] for r in rows)
    alloc = [(r["stratum"], (total_k * r["n_i"]) // N,
              (total_k * r["n_i"]) % N) for r in rows]
    extra = total_k - sum(b for _, b, _ in alloc)
    # NULL strata are legitimate (the reservoir samples them too):
    # order None first on remainder ties — a bare t[0] key raised
    # TypeError on None-vs-value comparison (r11 review find)
    by_rem = sorted(alloc, key=lambda t: (-t[2], t[0] is not None, t[0]))
    k_of = {s: b + (1 if i < extra else 0)
            for i, (s, b, _) in enumerate(by_rem)}
    kmax = max(k_of.values(), default=0)
    samp = stratified_reservoir(df, stratum_col, kmax, id_col, salt)
    # allocation table typed from the ACTUAL stratum column (a
    # hardcoded string schema crashed on numeric strata), joined
    # null-safely so a NULL stratum's k_i is not silently dropped by
    # the equi-join (which would shrink the sample below total_k)
    kdf = df.sparkSession.createDataFrame(
        [(s, k) for s, k in k_of.items()],
        StructType([StructField("__s", df.schema[stratum_col].dataType),
                    StructField("__k", LongType())]))
    return (samp.join(F.broadcast(kdf),
                      F.col(stratum_col).eqNullSafe(F.col("__s")))
            .filter(F.col("rnk") <= F.col("__k"))
            .select(stratum_col, id_col, "rnk"))


def dsir_importance(docs: DataFrame, target, n_buckets: int = 512,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by the log-likelihood ratio of its hashed n-gram
    features under a target-domain bag-of-ngrams model vs the raw-
    corpus model — the standard recipe for selecting pretraining data
    that matches a target distribution. `target` is a boolean Column
    marking the in-domain docs (e.g. F.col("lang") == "de").

    Features are word unigrams + bigrams hashed into `n_buckets`
    buckets (60-bit md5, engine-reproducible); both models are
    Laplace-smoothed (+1, denominator + n_buckets). Determinism: each
    bucket's ln p is rounded ONCE to integer nano-units, the per-doc
    accumulation is an exact integer sum (the doc_bigram_logppl
    trick), only the final /1e9 runs in double.

    Returns (doc_id, n_feats, logweight) for every doc; resample by
    taking the top-K logweight (or Gumbel-perturbed top-K for the
    stochastic variant).

    Scale shape: one corpus-sized explode + (doc, bucket) aggregate;
    both model tables are <= n_buckets rows (aggregated map-side), the
    scoring join broadcasts them, and the bucket-count normalizers
    ride in as broadcast single-row aggregates — no driver collect,
    no shuffle wider than the (doc, bucket) count."""
    # the (doc, bucket) counts feed the raw model, the target model,
    # both normalizers AND the scoring join — materialize once or the
    # corpus-sized explode re-runs four times (4 corpus scans at 100 TB)
    fb = _dsir_doc_buckets(docs, target, n_buckets, text_col,
                           id_col).localCheckpoint(eager=False)
    lp = dsir_model_from_buckets(fb, n_buckets)
    sc = (fb.join(F.broadcast(lp), "b")
          .groupBy(id_col)
          .agg(F.sum("cnt").cast("long").alias("n_feats"),
               F.sum(F.col("cnt") * F.col("du")).cast("long")
                .alias("units")))
    return (docs.select(id_col).join(sc, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_feats", F.lit(0)).cast("bigint")
                     .alias("n_feats"),
                    # signed nano-units: exact half-away (r13 tie class)
                    units6(F.coalesce("units", F.lit(0)))
                     .alias("logweight")))


def gumbel_topk(weights: DataFrame, k: int = 100,
                weight_col: str = "logweight",
                id_col: str = "doc_id",
                salt: str = "gumbel") -> DataFrame:
    """Gumbel-top-k resampling over log-weights — the exact sampling-
    without-replacement trick DSIR uses for its resample step: adding
    independent Gumbel(0,1) noise to each log-weight and taking the
    top k draws k items WITHOUT replacement with probability
    proportional to exp(weight). Noise is deterministic (inverse-CDF
    of a 52-bit md5 uniform, -ln(-ln(u))), so the draw is reproducible
    across engines, retries, and partitionings — no engine RNG.

    Determinism: both the weight and the Gumbel draw are rounded once
    to integer nano-units and RANKED on their exact integer sum
    (doc_id tie-break), so float addition can never reorder the top-k
    boundary. Plan: one narrow projection + TakeOrderedAndProject —
    the corpus never shuffles; only k rows reach the driver side of
    the ordered limit."""
    two52 = 4_503_599_627_370_496  # 2^52
    u = ((F.expr(f"CAST(conv(substr(md5(concat('{salt}:', "
                 f"CAST({id_col} AS STRING))), 1, 13), 16, 10) AS BIGINT)")
          + 1) / F.lit(float(two52 + 2)))
    g_units = F.round(-F.log(-F.log(u)) * 1e9).cast("long")
    w_units = F.round(F.col(weight_col) * 1e9).cast("long")
    scored = weights.select(
        F.col(id_col), F.col(weight_col),
        (w_units + g_units).alias("units"))
    top = scored.orderBy(F.desc("units"), id_col).limit(k)
    win = Window.orderBy(F.desc("units"), id_col)
    return (top.withColumn("rnk", F.row_number().over(win).cast("long"))
            .select(id_col, weight_col,
                    units6(F.col("units")).alias("score"),
                    "rnk"))


def _dsir_grams_expr() -> F.Column:
    return F.expr(
        "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws)-1), "
        "i -> concat(element_at(ws, i), ' ', element_at(ws, i+1))) "
        "ELSE CAST(array() AS array<string>) END")


def _dsir_doc_buckets(docs: DataFrame, target, n_buckets: int,
                      text_col: str, id_col: str) -> DataFrame:
    """(doc, bucket) feature counts: word unigrams + bigrams, 60-bit
    md5 hashed into n_buckets."""
    w = docs.select(
        F.col(id_col), target.alias("tgt"),
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
         .alias("ws"))
    f = w.select(
        F.col(id_col), "tgt",
        F.explode(F.concat(F.col("ws"), _dsir_grams_expr())).alias("feat"))
    return (f.select(
              F.col(id_col), "tgt",
              (F.expr("CAST(conv(substr(md5(feat), 1, 15), 16, 10) "
                      "AS BIGINT)") % n_buckets).alias("b"))
            .groupBy(id_col, "tgt", "b")
            .agg(F.count("*").cast("long").alias("cnt")))


def dsir_model_from_buckets(fb: DataFrame, n_buckets: int) -> DataFrame:
    """The frozen DSIR model: per bucket, the nano-unit ln-prob delta
    du = ln p_target - ln p_raw (Laplace-smoothed, each ln rounded
    once). <= n_buckets rows — broadcastable into a batch scoring
    join, or collectable into a map literal for a STATELESS streaming
    gate (see queries.stream_curation_gate)."""
    raw = fb.groupBy("b").agg(F.sum("cnt").cast("long").alias("c_r"))
    tgt = (fb.filter("tgt").groupBy("b")
           .agg(F.sum("cnt").cast("long").alias("c_t")))
    n_r = raw.agg(F.sum("c_r").cast("long").alias("n_r"))
    n_t = tgt.agg(F.sum("c_t").cast("long").alias("n_t"))
    units = lambda c, n: F.round(  # noqa: E731
        F.log((c + F.lit(1)).cast("double")
              / (n + F.lit(n_buckets)).cast("double")) * 1e9).cast("long")
    return (raw.join(F.broadcast(tgt), "b", "left")
            .crossJoin(F.broadcast(n_r)).crossJoin(F.broadcast(n_t))
            .select("b", (units(F.coalesce("c_t", F.lit(0)), F.col("n_t"))
                          - units(F.col("c_r"), F.col("n_r"))).alias("du")))
