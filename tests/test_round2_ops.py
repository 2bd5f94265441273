"""Round-2 operators: sequence packing, stratified reservoir sampling,
batched model inference, incremental MinHash maintenance."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from examples_scala_spark.operators.dedup import (
    minhash_delta, minhash_signatures)
from examples_scala_spark.operators.inference import (
    WEIGHTS, quality_model_scores)
from examples_scala_spark.operators.packing import PACK_STRIDE, pack_sequences
from examples_scala_spark.operators.sampling import stratified_reservoir
from examples_scala_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# ----------------------------------------------------------------- packing

def test_pack_sequences_cumsum_arithmetic(spark, sf_dir):
    budget, buckets = 64, 16
    out = pack_sequences(_docs(spark, sf_dir), budget=budget,
                         n_buckets=buckets).toPandas()
    assert len(out) == _docs(spark, sf_dir).count()
    # replay the packing arithmetic in pandas
    out = out.sort_values(["bucket", "doc_id"]).reset_index(drop=True)
    for bucket, grp in out.groupby("bucket"):
        cum = 0
        for row in grp.itertuples():
            assert row.offset == cum % budget
            assert row.pack_id == bucket * PACK_STRIDE + cum // budget
            cum += row.n_tokens
    # offsets always inside the budget, ids in the bucket's stride range
    assert (out["offset"] < budget).all()
    assert (out["pack_id"] // PACK_STRIDE == out["bucket"]).all()


def test_pack_sequences_partition_invariant(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = pack_sequences(docs.repartition(7), budget=32, n_buckets=8)
    b = pack_sequences(docs.coalesce(1), budget=32, n_buckets=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --------------------------------------------------------------- reservoir

def test_stratified_reservoir_matches_direct_bottom_k(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    k = 7
    got = stratified_reservoir(docs.repartition(13), "lang", k, "doc_id")
    # direct global ranking over the full table (the oracle semantics)
    u = (F.conv(F.substring(
        F.md5(F.concat(F.lit("rsv-"), F.col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("bigint"))
    w = Window.partitionBy("lang").orderBy("u", "doc_id")
    want = (docs.select("lang", "doc_id", u.alias("u"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("lang", "doc_id", F.col("rnk").cast("long").alias("rnk")))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stratified_reservoir_exact_k_per_stratum(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sizes = dict(docs.groupBy("lang").count().collect())
    k = 5
    got = stratified_reservoir(docs, "lang", k, "doc_id")
    per = dict(got.groupBy("lang").count().collect())
    assert per == {lang: min(k, n) for lang, n in sizes.items()}


def test_stratified_reservoir_null_stratum_is_its_own_partition(spark):
    """NULL strata must not be dropped by the stage-1 pandas prune
    (groupby dropna=False): they form their own partition, exactly as
    the stage-2 window and the SQL oracle treat them."""
    from examples_scala_spark.operators.sampling import weighted_reservoir
    rows = ([(i, "en", 1.0) for i in range(20)]
            + [(i, None, 1.0) for i in range(100, 130)])
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    k = 4
    got = stratified_reservoir(df.repartition(9), "lang", k, "doc_id")
    per = {r["lang"]: r["count"]
           for r in got.groupBy("lang").count().collect()}
    assert per == {"en": k, None: k}
    wgot = weighted_reservoir(df.repartition(9), "lang", k, "doc_id", "w")
    wper = {r["lang"]: r["count"]
            for r in wgot.groupBy("lang").count().collect()}
    assert wper == {"en": k, None: k}


# --------------------------------------------------------------- inference

def test_quality_model_matches_jvm_expression(spark, sf_dir):
    """The pandas-UDF forward pass must equal the same formula computed
    entirely JVM-side — proves the Arrow plumbing transports values
    unchanged."""
    scored = quality_model_scores(_docs(spark, sf_dir))
    w = WEIGHTS
    jvm = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-(
        F.lit(w["bias"])
        + F.lit(w["log_len"]) * F.log(F.col("n_chars") + F.lit(1.0))
        + F.lit(w["stop_ratio"]) * (F.col("n_stop")
                                    / F.col("n_words").cast("double"))
        + F.lit(w["punct_ratio"]) * (F.col("n_punct")
                                     / F.col("n_words").cast("double"))))), 6)
    bad = scored.withColumn("jvm", jvm).filter(
        F.abs(F.col("score") - F.col("jvm")) > 1e-9)
    assert bad.count() == 0
    rng = scored.agg(F.min("score"), F.max("score")).first()
    assert 0.0 < rng[0] and rng[1] < 1.0


# ------------------------------------------------------- incremental minhash

def test_minhash_delta_equals_full_recompute(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(200).cache()
    prior = minhash_signatures(docs, num_hashes=8, n=3)
    # changelog: update ids %7==0, delete ids %7==1, insert two new docs
    updates = (docs.filter(F.col("doc_id") % 7 == 0)
               .select("doc_id", F.lit("upsert").alias("op"),
                       F.concat("text", F.lit(" changed")).alias("text")))
    deletes = (docs.filter(F.col("doc_id") % 7 == 1)
               .select("doc_id", F.lit("delete").alias("op"), "text"))
    inserts = spark.createDataFrame(
        [(10_000_001, "upsert", "brand new document text here"),
         (10_000_002, "upsert", "xx")],  # < 3 words: no shingles, no sig
        "doc_id bigint, op string, text string")
    changes = updates.unionByName(deletes).unionByName(inserts)

    got = minhash_delta(prior, changes, num_hashes=8, n=3)

    new_corpus = (
        docs.filter(F.col("doc_id") % 7 != 1)
        .select("doc_id",
                F.when(F.col("doc_id") % 7 == 0,
                       F.concat("text", F.lit(" changed")))
                 .otherwise(F.col("text")).alias("text"))
        .unionByName(inserts.select("doc_id", "text")))
    want = minhash_signatures(new_corpus, num_hashes=8, n=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    docs.unpersist()


# ---------------------------------------------------------- semantic dedup

def test_semantic_dedup_keeper_invariants(spark, sf_dir):
    from examples_scala_spark.operators.similarity import semantic_dedup
    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, threshold=0.35).toPandas()
    # every vector appears exactly once; keepers keep themselves
    assert out["vec_id"].is_unique and len(out) == emb.count()
    kept = out[out["kept"]]
    assert (kept["keep_id"] == kept["vec_id"]).all()
    # a dropped vector's keeper has a smaller id and lives in some cell
    dropped = out[~out["kept"]]
    assert (dropped["keep_id"] < dropped["vec_id"]).all()
    assert set(dropped["keep_id"]).issubset(set(out["vec_id"]))


# ------------------------------------------------------------ quality gate

def test_quality_checks_count_injected_violations(spark):
    from examples_scala_spark.operators.quality_checks import (
        check_columns, check_references, check_unique)
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 200.0), (3, None)],
        "id int, v double")
    rows = dict(check_columns(df, {
        "v_negative": F.col("v") < 0,
        "v_null": F.col("v").isNull(),
        "v_over_100": F.col("v") > 100,
    }).collect())
    assert rows == {"v_negative": 1, "v_null": 1, "v_over_100": 1}
    assert dict(check_unique(df, ["id"], "id_unique").collect()) == \
        {"id_unique": 1}
    dim = spark.createDataFrame([(1,), (2,)], "k int")
    assert dict(check_references(df, "id", dim, "k", "fk").collect()) == \
        {"fk": 1}


# ------------------------------------------------------- weighted reservoir

def test_weighted_reservoir_length_bias_and_invariance(spark):
    from examples_scala_spark.operators.sampling import weighted_reservoir
    # two weight classes: ids 0..999 weight 1, ids 1000..1999 weight 9
    df = spark.createDataFrame(
        [(i, "s", 1.0 if i < 1000 else 9.0) for i in range(2000)],
        "doc_id long, lang string, w double")
    got = weighted_reservoir(df, "lang", 200, "doc_id", "w")
    rows = got.collect()
    assert len(rows) == 200
    heavy = sum(1 for r in rows if r.doc_id >= 1000)
    # heavy class holds 90% of the mass; E[heavy] ~ 180 of 200.
    # loose 3-sigma-ish band — the draw is deterministic, so this
    # never flakes once it passes
    assert heavy > 150, heavy
    # partition invariance: the sample is a pure function of the data
    again = weighted_reservoir(df.repartition(17), "lang", 200,
                               "doc_id", "w")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


# ----------------------------------------------------- empty-input hardening

def test_operators_survive_empty_input(spark, sf_dir):
    """A 100 TB pipeline routinely produces empty slices (a filter that
    matches nothing, a new partition, a drained changelog). Operators
    must return empty/defined results, never throw."""
    from examples_scala_spark.operators.dedup import (
        exact_dedup, minhash_delta, minhash_signatures)
    from examples_scala_spark.operators.inference import (
        quality_model_scores as score)
    from examples_scala_spark.operators.packing import pack_sequences
    from examples_scala_spark.operators.sampling import (
        stratified_reservoir, weighted_reservoir)

    docs = _docs(spark, sf_dir)
    empty = docs.filter(F.lit(False))
    assert pack_sequences(empty).count() == 0
    assert stratified_reservoir(empty, "lang", 5, "doc_id").count() == 0
    assert weighted_reservoir(empty, "lang", 5, "doc_id",
                              "n_chars").count() == 0
    assert score(empty).count() == 0
    assert exact_dedup(empty).count() == 0
    assert minhash_signatures(empty, num_hashes=4).count() == 0
    # empty changelog: delta == priors, bit for bit
    prior = minhash_signatures(docs.limit(50), num_hashes=4)
    changes = spark.createDataFrame(
        [], "doc_id bigint, op string, text string")
    got = minhash_delta(prior, changes, num_hashes=4)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, prior.collect()))


# ------------------------------------------------------------------- cdc

def test_apply_changelog_semantics(spark):
    from examples_scala_spark.operators.cdc import apply_changelog
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    chg = spark.createDataFrame(
        [(2, "upsert", "b2", 1), (2, "delete", None, 2),   # delete wins
         (3, "upsert", "c2", 1),                           # update
         (4, "upsert", "d", 1), (4, "upsert", "d2", 2)],   # insert, LWW
        "k long, op string, v string, seq long")
    got = sorted(map(tuple, apply_changelog(
        snap, chg, key="k", order_cols=["seq"]).collect()))
    assert got == [(1, "a"), (3, "c2"), (4, "d2")]
