"""Round-3 continuation operators, batch 2: CUSUM drift, per-key OLS
trend, triangle stats on the near-dup graph, prefix-filtered
set-similarity join, the part skyline, and the Gopher-rule quality
flag suite. Each test checks the algorithmic core against an
independent formulation (sequential recursion, numpy, brute force)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from examples_scala_spark.operators.dedup import (
    ngram_jaccard_pairs, minhash_lsh_pairs, setsim_prefix_join)
from examples_scala_spark.operators.graph import triangle_stats
from examples_scala_spark.operators.text import gopher_quality_flags
from examples_scala_spark.operators.timeseries import cusum_flags, ols_trend
from examples_scala_spark.sources.tables import load_table


# ------------------------------------------------------------------ cusum

def test_cusum_closed_form_equals_sequential_recursion(spark):
    rng = np.random.default_rng(7)
    rows = []
    for key in ("a", "b"):
        xs = rng.integers(-50, 60, size=200)
        rows += [(key, int(i), int(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, i long, x long")
    out = cusum_flags(df, "k", [F.col("i")], F.col("x"), F.lit(10),
                      slack_units=2, h_units=100)
    got = {(r["k"], r["i"]): (r["cusum_units"], r["drift"])
           for r in out.collect()}
    for key in ("a", "b"):
        s = 0
        for k, i, x in rows:
            if k != key:
                continue
            s = max(0, s + x - 10 - 2)
            assert got[(key, i)] == (s, s > 100), (key, i)


def test_cusum_flags_some_drift_on_shifted_series(spark):
    # in-control around 0, then a +30 shift: drift must fire after it
    rows = [("k", i, 0 if i < 50 else 30) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, i long, x long")
    out = (cusum_flags(df, "k", [F.col("i")], F.col("x"), F.lit(0),
                       slack_units=5, h_units=200)
           .filter("drift").agg(F.min("i")).collect()[0][0])
    assert out == 50 + 200 // 25  # first i where (30-5)*(i-49) > 200


# -------------------------------------------------------------------- ols

def test_ols_trend_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(11)
    rows = []
    for key in ("a", "b", "c"):
        xs = rng.integers(0, 10_000, size=300)
        noise = rng.integers(-500, 500, size=300)
        slope = {"a": 3, "b": -2, "c": 0}[key]
        rows += [(key, int(x), int(slope * x + 1000 + e))
                 for x, e in zip(xs, noise)]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = {r["k"]: (r["slope"], r["intercept"])
           for r in ols_trend(df, "k", F.col("x"), F.col("y")).collect()}
    for key in ("a", "b", "c"):
        xs = np.array([x for k, x, _ in rows if k == key], dtype=float)
        ys = np.array([y for k, _, y in rows if k == key], dtype=float)
        m, b = np.polyfit(xs, ys, 1)
        assert abs(out[key][0] - m) < 1e-6, key
        assert abs(out[key][1] - b) < 1e-3, key


def test_ols_trend_degenerate_keys_yield_null(spark):
    df = spark.createDataFrame(
        [("one", 5, 7), ("flat", 3, 1), ("flat", 3, 9)],
        "k string, x long, y long")
    out = {r["k"]: (r["slope"], r["intercept"])
           for r in ols_trend(df, "k", F.col("x"), F.col("y")).collect()}
    assert out["one"] == (None, None)   # a single point
    assert out["flat"] == (None, None)  # zero x-variance


# -------------------------------------------------------------- triangles

def test_triangle_stats_hand_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5-1
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((5, 1))
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {r["id"]: (r["degree"], r["triangles"], r["lcc"])
           for r in triangle_stats(nodes, e).collect()}
    assert out[1] == (4, 3, round(2 * 3 / (4 * 3), 6))
    for n in (2, 3, 4):
        assert out[n] == (3, 3, 1.0)
    assert out[5] == (1, 0, 0.0)
    assert out[6] == (0, 0, 0.0)  # isolated node


def test_triangle_stats_orientation_invariant(spark):
    # same graph with reversed/duplicated edges must give same counts
    nodes = spark.createDataFrame([(i,) for i in range(1, 4)], "id long")
    e1 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long")
    e2 = spark.createDataFrame(
        [(2, 1), (3, 2), (1, 3), (3, 1)], "src long, dst long")
    r1 = sorted(map(tuple, triangle_stats(nodes, e1).collect()))
    r2 = sorted(map(tuple, triangle_stats(nodes, e2).collect()))
    assert r1 == r2
    assert r1[0][1:] == (2, 1, 1.0)


def test_triangle_total_matches_lsh_graph_bruteforce(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3,
                              threshold=0.5)
    out = triangle_stats(docs.select("doc_id"), edges, id_col="doc_id",
                         src_col="doc_a", dst_col="doc_b")
    total = out.agg(F.sum("triangles")).collect()[0][0]
    es = {(r["doc_a"], r["doc_b"]) for r in edges.collect()}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    brute = sum(1 for a, b in es for c in adj[a] & adj[b] if c > b)
    assert total == 3 * brute


# ------------------------------------------------------- prefix setsim

def test_setsim_prefix_equals_sparse_equijoin(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    for t_num, t_den in ((1, 2), (7, 10)):
        a = sorted(map(tuple, setsim_prefix_join(
            docs, n=3, t_num=t_num, t_den=t_den).collect()))
        b = sorted(map(tuple, ngram_jaccard_pairs(
            docs, n=3, threshold=t_num / t_den).collect()))
        assert a == b, (t_num, t_den)


def test_setsim_prefix_index_is_smaller_than_full_index(spark, sf_dir):
    # the whole point of the prefix filter: fewer indexed tokens
    docs = load_table(spark, sf_dir, "documents")
    from examples_scala_spark.operators.dedup import word_shingles, base_hash
    full = (word_shingles(docs, n=3, distinct=False)
            .select("doc_id", base_hash(F.col("shingle")).alias("t"))
            .distinct().count())
    # reproduce the operator's prefix and count it
    from pyspark.sql.window import Window
    tok = (word_shingles(docs, n=3, distinct=False)
           .select("doc_id", base_hash(F.col("shingle")).alias("tok"))
           .distinct())
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = (tok.join(dfreq, "tok")
              .withColumn("pos", F.row_number().over(
                  Window.partitionBy("doc_id").orderBy("df", "tok")))
              .withColumn("sz", F.count("*").over(
                  Window.partitionBy("doc_id"))))
    pref = ranked.filter(
        F.col("pos") <= F.col("sz") - F.expr("(7 * sz + 9) DIV 10") + 1)
    assert pref.count() < 0.5 * full


# ----------------------------------------------------------------- skyline

def test_part_skyline_dominance_properties(spark, sf_dir):
    p = (load_table(spark, sf_dir, "part")
         .select("p_partkey",
                 F.round(F.col("p_retailprice") * 100).cast("long")
                  .alias("price"),
                 F.col("p_size").alias("size")))
    pts = [(r["p_partkey"], r["price"], r["size"]) for r in p.collect()]
    from examples_scala_spark.queries import REGISTRY
    sky = {r["p_partkey"]
           for r in REGISTRY["part_skyline"].fn(spark, sf_dir).collect()}

    def dominated(k, pr, sz):
        return any(q[1] <= pr and q[2] >= sz and (q[1] < pr or q[2] > sz)
                   for q in pts)

    for k, pr, sz in pts:
        assert (k in sky) == (not dominated(k, pr, sz)), k
    assert 0 < len(sky) < len(pts)


# ------------------------------------------------------------ gopher flags

def test_gopher_flags_each_rule_isolated(spark):
    base = "the and of to a " + " ".join(f"word{i}" for i in range(40))  # 45 words
    docs = spark.createDataFrame([
        (1, base),                                     # passes everything
        (2, "the and of to a short doc"),              # < 30 words
        (3, "the and of to a " + " ".join("x" * 20 for _ in range(40))),
        (4, " ".join(f"word{i}" for i in range(45))),  # no stopwords
        (5, base + " spam" * 10),                      # dominance > 10%
        (6, "the and of to a " + "dup dup dup " * 15), # low ttr + dominance
    ], "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(docs).collect()}
    assert out[1]["keep"] and out[1]["n_failed"] == 0
    assert not out[2]["flag_word_count"]
    assert not out[3]["flag_mean_word_len"]   # mean word length > 10
    assert not out[4]["flag_stopwords"]
    assert not out[5]["flag_dominance"]
    assert not out[6]["flag_ttr"] and not out[6]["flag_dominance"]
    for d in (2, 3, 4, 5, 6):
        assert not out[d]["keep"]


def test_gopher_flags_thresholds_are_exact_integer_boundaries(spark):
    # 30 words exactly -> passes word_count; 29 fails. ttr boundary:
    # 12 distinct of 30 = 0.4 passes; 11 fails.
    w30 = "the and of to a " + " ".join(f"w{i}" for i in range(25))
    w29 = "the and of to a " + " ".join(f"w{i}" for i in range(24))
    ttr_pass = "the and of to a w1 w2 w3 w4 w5 w6 w7 " + "pad " * 18
    docs = spark.createDataFrame(
        [(1, w30), (2, w29), (3, ttr_pass.strip())],
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(docs).collect()}
    assert out[1]["flag_word_count"] and out[1]["n_words"] == 30
    assert not out[2]["flag_word_count"] and out[2]["n_words"] == 29
    assert out[3]["n_words"] == 30 and out[3]["flag_ttr"]
