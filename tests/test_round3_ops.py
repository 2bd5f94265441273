"""Round-3 operators: BM25 retrieval scoring, bloom-filter
decontamination pruning, budgeted greedy-prefix corpus selection."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from examples_scala_spark.operators.bloom import (
    bloom_benchmark_overlap, build_bitmap, might_contain_udf)
from examples_scala_spark.operators.dedup import benchmark_overlap
from examples_scala_spark.operators.selection import budget_prefix_select
from examples_scala_spark.operators.text import bm25_topk
from examples_scala_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# ------------------------------------------------------------------- bm25

def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a d"), (3, "e e e e")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["bm25"]
           for r in bm25_topk(docs, ["a"], k1=1.5, b=0.75, topk=10).collect()}
    n, avgdl = 3.0, (4 + 2 + 4) / 3.0
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        return round(idf * tf * 2.5 / (tf + 1.5 * (0.25 + 0.75 * dl / avgdl)), 6)

    assert out == {1: score(2, 4), 2: score(1, 2)}  # doc 3 has no hit


def test_bm25_topk_cut_is_deterministic(spark, sf_dir):
    out = bm25_topk(_docs(spark, sf_dir), ["spark", "join"], topk=5).collect()
    assert len(out) <= 5
    keys = [(-r["bm25"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)


# ------------------------------------------------------------------ bloom

def test_bloom_no_false_negatives_and_fp_bound(spark):
    keys = spark.range(0, 2000).select((F.col("id") * 7919).alias("key"))
    bc = build_bitmap(keys, "key", m_bits=1 << 15, k=5)
    probe = might_contain_udf(bc, m_bits=1 << 15, k=5)
    # every inserted key must test positive
    assert keys.filter(~probe(F.col("key"))).count() == 0
    # disjoint probe set: fp rate stays near the analytic bound
    other = spark.range(0, 20000).select((F.col("id") * 7919 + 3).alias("key"))
    fp = other.filter(probe(F.col("key"))).count() / 20000
    load = 1 - math.exp(-5 * 2000 / (1 << 15))
    assert fp <= 2 * load ** 5 + 0.01


def test_bloom_overlap_equals_exact_overlap(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    via_bloom = bloom_benchmark_overlap(corpus, bench, n=3,
                                        frac_threshold=0.05).toPandas()
    exact = (benchmark_overlap(corpus, bench, n=3, frac_threshold=0.05)
             .filter(F.col("n_overlap") > 0).toPandas())
    key = ["doc_id"]
    via_bloom = via_bloom.sort_values(key).reset_index(drop=True)
    exact = exact.sort_values(key).reset_index(drop=True)
    assert via_bloom.equals(exact[via_bloom.columns])
    assert len(via_bloom) > 0  # the comparison is not vacuous


# -------------------------------------------------------------- selection

def _naive_prefix(df, budget):
    w = (Window.orderBy("__bucket", F.col("n_words").asc(),
                        F.col("doc_id").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("cum", F.sum("n_words").over(w))
            .filter(F.col("cum") <= budget).drop("cum"))


def test_budget_select_equals_naive_window(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"))
    df = docs.withColumn(
        "__bucket", F.least((F.col("n_words") / 8).cast("int"), F.lit(63)))
    for budget in (0, 500, 2000, 10**9):
        got = sorted(r["doc_id"] for r in budget_prefix_select(
            df, "__bucket", "n_words", budget,
            [F.col("n_words").asc(), F.col("doc_id").asc()]).collect())
        want = sorted(r["doc_id"] for r in _naive_prefix(df, budget).collect())
        assert got == want, f"budget={budget}"


def test_budget_select_exhausts_budget_exactly(spark):
    # weights 1..10 ordered by id: prefix sums 1,3,6,10,15... budget 10
    # keeps ids 1..4 and nothing else
    df = (spark.range(1, 11)
          .select(F.col("id").alias("doc_id"), F.col("id").alias("n_words"))
          .withColumn("__bucket", (F.col("doc_id") / 3).cast("int")))
    out = budget_prefix_select(df, "__bucket", "n_words", 10,
                               [F.col("doc_id").asc()])
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3, 4]


# ------------------------------------------------------- diff / shards

def test_snapshot_diff_roundtrips_through_apply_changelog(spark):
    from examples_scala_spark.operators.cdc import (
        apply_changelog, snapshot_diff)
    old = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)],
        "user_id long, value double")
    new = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (4, None), (5, 50.0)],
        "user_id long, value double")
    diff = snapshot_diff(old, new, "user_id", ["value"])
    got = {r["user_id"]: r["op"] for r in diff.collect()}
    # 1 unchanged (absent), 2 NULL->20 update, 3 delete, 4 40->NULL
    # update, 5 insert
    assert got == {2: "update", 3: "delete", 4: "update", 5: "insert"}
    # round-trip: old + diff-as-changelog == new
    chg = diff.select(
        "user_id",
        F.when(F.col("op") == "delete", "delete").otherwise("upsert")
         .alias("op"),
        F.col("new_value").alias("value"),
        F.lit(1).alias("seq"))
    rebuilt = apply_changelog(old, chg, key="user_id", order_cols=["seq"])
    assert (sorted(map(tuple, rebuilt.collect()))
            == sorted(map(tuple, new.collect())))


def test_shuffle_shards_is_a_permutation_and_seed_sensitive(spark, sf_dir):
    from examples_scala_spark.operators.sampling import shuffle_shards
    docs = _docs(spark, sf_dir).select("doc_id")
    n = docs.count()
    a = shuffle_shards(docs, "doc_id", n_shards=8, seed="a").toPandas()
    # every doc exactly once; positions are 1..|shard| per shard
    assert len(a) == n and a["doc_id"].is_unique
    for _, grp in a.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    # a different seed produces a different order (overwhelmingly)
    b = shuffle_shards(docs, "doc_id", n_shards=8, seed="b").toPandas()
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert ((merged["shard_a"] != merged["shard_b"])
            | (merged["pos_a"] != merged["pos_b"])).any()
    # deterministic under recompute
    a2 = shuffle_shards(docs, "doc_id", n_shards=8, seed="a").toPandas()
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        a2.sort_values("doc_id").reset_index(drop=True))


# ------------------------------------------------------ substring dups

def test_substring_dup_stats_matches_bruteforce(spark, sf_dir):
    from collections import Counter
    from examples_scala_spark.operators.dedup import substring_dup_stats
    L = 30
    rows = _docs(spark, sf_dir).select("doc_id", "text").collect()
    counts = Counter(
        r["text"][i:i + L]
        for r in rows if len(r["text"]) >= L
        for i in range(len(r["text"]) - L + 1))
    expect = {}
    for r in rows:
        t = r["text"]
        if len(t) < L:
            continue
        n_pos = len(t) - L + 1
        n_dup = sum(1 for i in range(n_pos) if counts[t[i:i + L]] >= 2)
        expect[r["doc_id"]] = (n_pos, n_dup)
    got = {r["doc_id"]: (r["n_positions"], r["n_dup"])
           for r in substring_dup_stats(
               _docs(spark, sf_dir), L=L).collect()}
    assert got == expect
    assert any(d for _, d in got.values())  # not vacuous: dups exist


# ------------------------------------------------------------- gap fill

def test_gap_fill_locf_semantics(spark):
    from examples_scala_spark.operators.timeseries import gap_fill_locf
    df = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 13, 2.0), ("b", 5, 9.0)],
        "k string, bucket long, v double")
    out = sorted(map(tuple, gap_fill_locf(df, "k", "bucket", "v").collect()))
    assert out == [
        ("a", 10, 1.0, False), ("a", 11, 1.0, True), ("a", 12, 1.0, True),
        ("a", 13, 2.0, False), ("b", 5, 9.0, False)]


# -------------------------------------------------- leakage-free split

def test_leakage_free_split_never_separates_near_dups(spark, sf_dir):
    from examples_scala_spark.queries import REGISTRY
    from examples_scala_spark.operators.dedup import minhash_lsh_pairs
    out = REGISTRY["leakage_free_split"].fn(spark, sf_dir).toPandas()
    # all members of a cluster share one split
    assert (out.groupby("cluster_id")["split"].nunique() <= 1).all()
    # no near-dup pair crosses a split boundary
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), num_hashes=16,
                              bands=4, n=3, threshold=0.5).toPandas()
    split_of = dict(zip(out["doc_id"], out["split"]))
    assert len(pairs) > 0
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert split_of[a] == split_of[b]


# ------------------------------------------------ incremental IVF index

def test_ivf_incremental_assign_equals_full_reassign(spark, sf_dir):
    from examples_scala_spark.operators import similarity as sim
    emb = load_table(spark, sf_dir, "embeddings")
    base = sim.with_norm(emb).select("vec_id", "v", "norm")
    cents = sim.sampled_centroids(base)
    full = sim.assign_cells(base, cents).toPandas()
    prior = sim.assign_cells(base.filter(F.col("vec_id") % 5 != 0), cents)
    changes = (emb.filter(F.col("vec_id") % 5 == 0)
               .select("vec_id", "embedding", F.lit("upsert").alias("op")))
    merged = sim.ivf_incremental_assign(prior, changes, cents).toPandas()
    full = full.sort_values("vec_id").reset_index(drop=True)
    merged = merged.sort_values("vec_id").reset_index(drop=True)
    assert merged.equals(full)
    # deletes disappear
    dels = changes.withColumn("op", F.lit("delete"))
    after_del = sim.ivf_incremental_assign(prior, dels, cents).toPandas()
    assert set(after_del["vec_id"]) == set(
        full[full["vec_id"] % 5 != 0]["vec_id"])


# ------------------------------------------------------ multi-probe LSH

def test_multiprobe_lsh_recall_dominates_single_probe(spark, sf_dir):
    from examples_scala_spark.operators import similarity as sim
    emb = load_table(spark, sf_dir, "embeddings")

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    exact = pairs(sim.brute_force_topk(emb, k=5, query_mod=10))
    single = pairs(sim.lsh_topk(emb, k=5, query_mod=10))
    multi = pairs(sim.lsh_multiprobe_topk(emb, k=5, query_mod=10))
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    # probing a superset of buckets can only add candidates
    assert r_multi >= r_single
    assert r_multi > 0


# ------------------------------------------------- exact stratified split

def test_stratified_split_exact_total_and_proportionality(spark, sf_dir):
    from examples_scala_spark.operators.sampling import stratified_split_exact
    docs = _docs(spark, sf_dir)
    out = stratified_split_exact(docs, "source", "doc_id",
                                 total_k=40).toPandas()
    assert len(out) == 40
    assert out["doc_id"].is_unique
    # per-stratum counts differ from exact proportionality by < 1
    n = docs.groupBy("source").count().toPandas().set_index("source")["count"]
    got = out.groupby("source").size()
    for s, n_i in n.items():
        share = 40 * n_i / n.sum()
        assert abs(got.get(s, 0) - share) < 1


# ------------------------------------------------- compression ratio

def test_compression_ratio_matches_direct_zlib(spark, sf_dir):
    import zlib
    from examples_scala_spark.operators.inference import compression_ratio
    docs = _docs(spark, sf_dir)
    out = compression_ratio(docs).toPandas().set_index("doc_id")
    rows = docs.select("doc_id", "text").collect()
    assert len(out) == len(rows)
    for r in rows:
        z = len(zlib.compress(r["text"].encode("utf-8"), 6))
        assert out.loc[r["doc_id"], "z_len"] == z
        # Spark round() is HALF_UP; Python round() is banker's
        assert abs(out.loc[r["doc_id"], "ratio"] - len(r["text"]) / z) < 1e-6
    # word-soup synthetic docs mostly compress (short docs can dip
    # under 1.0 on zlib header overhead — that's the signal working)
    assert out["ratio"].median() > 1
    assert (out["ratio"] > 0).all()


# ------------------------------------------------- distributed prefix sum

def test_ordered_prefix_sum_equals_naive_window(spark):
    from examples_scala_spark.operators.prefix import ordered_prefix_sum
    df = (spark.range(0, 1000)
          .select(F.col("id"),
                  F.pmod(F.col("id") * 7919, F.lit(997)).alias("w")))
    got = ordered_prefix_sum(
        df, [F.col("w").desc(), F.col("id").asc()], "w",
        out_col="cum", partitions=7).toPandas()
    naive = (df.withColumn("cum", F.sum("w").over(
        Window.orderBy(F.col("w").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .toPandas())
    got = got.sort_values("id").reset_index(drop=True)
    naive = naive.sort_values("id").reset_index(drop=True)
    assert got["cum"].tolist() == naive["cum"].tolist()
    assert len(got) == 1000


# -------------------------------------- repetition stats narrow rewrite

def test_doc_repetition_narrow_equivalence(spark, sf_dir):
    """The r5 zero-shuffle form (sorted-bigram run-length fold) must
    return exactly what the original two-shuffle aggregate composition
    returns — on the sf0.001 corpus AND on hand-built edge docs
    (all-identical bigrams, all-distinct, empty/one-token dropped)."""
    from examples_scala_spark.queries import REGISTRY

    def aggregate_form(docs):
        toks = docs.select("doc_id", F.expr(
            "regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("w"))
        grams = F.expr(
            "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w)-1), "
            "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) "
            "ELSE CAST(array() AS array<string>) END")
        base = toks.select(
            "doc_id",
            F.size("w").cast("bigint").alias("n_words"),
            F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct"),
            F.explode(grams).alias("bigram"))
        bi = base.groupBy("doc_id", "bigram").agg(
            F.count("*").alias("c"),
            F.max("n_words").alias("n_words"),
            F.max("n_distinct").alias("n_distinct"))
        return bi.groupBy("doc_id").agg(
            F.max("n_words").cast("bigint").alias("n_words"),
            F.round(1.0 - F.max("n_distinct") / F.max("n_words"), 6)
             .alias("dup_word_frac"),
            F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"))

    def cmp(narrow_df, docs):
        a = (narrow_df.toPandas().sort_values("doc_id")
             .reset_index(drop=True))
        b = (aggregate_form(docs).toPandas().sort_values("doc_id")
             .reset_index(drop=True))
        assert a.columns.tolist() == b.columns.tolist()
        assert a.values.tolist() == b.values.tolist()
        return len(a)

    n = cmp(REGISTRY["doc_repetition_stats"].fn(spark, sf_dir),
            _docs(spark, sf_dir))
    assert n > 0

    edge = spark.createDataFrame(
        [(1, "x y x y x y"),        # one bigram dominates ("x y" 3x)
         (2, "a b c d e"),          # all bigrams distinct
         (3, "solo"),               # one token -> dropped
         (4, ""),                   # empty -> dropped
         (5, "Tie tie TIE tie")],   # case-folded identical run
        "doc_id long, text string")

    # the registry query is bound to the parquet table, so rebuild the
    # same narrow expression over the edge frame to compare both forms
    def narrow_form(docs):
        max_run = F.expr("""
          aggregate(
            array_sort(transform(sequence(1, size(w) - 1),
                       i -> concat(element_at(w, i), ' ',
                                   element_at(w, i + 1)))),
            named_struct('prev', cast(null as string),
                         'run', cast(0 as bigint),
                         'best', cast(0 as bigint)),
            (acc, x) -> named_struct(
              'prev', x,
              'run', CASE WHEN x <=> acc.prev THEN acc.run + 1
                          ELSE cast(1 as bigint) END,
              'best', greatest(acc.best,
                      CASE WHEN x <=> acc.prev THEN acc.run + 1
                           ELSE cast(1 as bigint) END)),
            acc -> acc.best)""")
        toks = docs.select("doc_id", F.expr(
            "regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("w"))
        return (toks.filter(F.size("w") >= 2)
                .select("doc_id",
                        F.size("w").cast("bigint").alias("n_words"),
                        F.size(F.array_distinct("w")).cast("bigint")
                         .alias("n_distinct"),
                        max_run.alias("max_c"))
                .select("doc_id", "n_words",
                        F.round(1.0 - F.col("n_distinct")
                                / F.col("n_words"), 6)
                         .alias("dup_word_frac"),
                        F.round(F.col("max_c") / (F.col("n_words") - 1), 6)
                         .alias("top_bigram_frac")))

    n_edge = cmp(narrow_form(edge), edge)
    assert n_edge == 3  # docs 3 and 4 dropped by both forms
    got = {r["doc_id"]: r for r in narrow_form(edge).collect()}
    assert got[1]["top_bigram_frac"] == 0.6          # "x y" 3 of 5
    assert got[2]["top_bigram_frac"] == 0.25         # 4 distinct bigrams
    assert got[5]["dup_word_frac"] == 0.75           # 4 words, 1 distinct
    assert got[5]["top_bigram_frac"] == 1.0          # "tie tie" run of 3
