"""t-digest quantile sketch (operators/sketches.py): determinism,
bounded accumulator size, rank-error vs exact, merge invariance, and
the Spark two-level tree end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from examples_scala_spark.operators.sketches import (
    compress, quantile, tdigest_quantiles)


def _rank_error(values: np.ndarray, estimate: float, p: float) -> float:
    return abs((values <= estimate).mean() - p)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    return np.concatenate([rng.normal(50, 10, 20_000),
                           rng.exponential(5, 5_000) + 100])  # heavy tail


def test_compress_deterministic_and_bounded(data):
    w = np.ones_like(data)
    v1, w1 = compress(data, w, delta=100)
    v2, w2 = compress(data.copy(), w.copy(), delta=100)
    assert np.array_equal(v1, v2) and np.array_equal(w1, w2)
    assert len(v1) <= 2 * 100            # bounded accumulator
    assert w1.sum() == pytest.approx(len(data))
    assert np.all(np.diff(v1) >= 0)      # sorted centroids


@pytest.mark.parametrize("p", [0.01, 0.25, 0.5, 0.9, 0.99])
def test_quantile_rank_error(data, p):
    cv, cw = compress(data, np.ones_like(data), delta=100)
    est = quantile(cv, cw, p)
    assert _rank_error(data, est, p) < 0.02


def test_merge_invariance(data):
    """Digesting shards then merging must track the one-shot digest —
    the AggregateFunction.merge contract the two-level tree relies on."""
    shards = np.array_split(data, 8)
    parts = [compress(s, np.ones_like(s), delta=100) for s in shards]
    cv = np.concatenate([p[0] for p in parts])
    cw = np.concatenate([p[1] for p in parts])
    mv, mw = compress(cv, cw, delta=100)
    assert mw.sum() == pytest.approx(len(data))
    for p in (0.1, 0.5, 0.9, 0.99):
        assert _rank_error(data, quantile(mv, mw, p), p) < 0.03


def test_misra_gries_exact_when_k_covers_domain():
    from examples_scala_spark.operators.sketches import misra_gries

    counts = {}
    stream = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    for it in stream:
        misra_gries(counts, it, 1, k=8)
    assert counts == {"a": 5, "b": 3, "c": 2}


def test_misra_gries_lower_bounds_under_eviction():
    """k=2 over 3 items: counters are lower bounds, error <= n/(k+1),
    and the true heavy hitter survives."""
    from examples_scala_spark.operators.sketches import misra_gries

    counts = {}
    stream = ["a", "b", "a", "c", "a", "b", "a"]  # a:4 b:2 c:1, n=7
    for it in stream:
        misra_gries(counts, it, 1, k=2)
    assert "a" in counts
    assert counts["a"] <= 4 and 4 - counts["a"] <= 7 // 3 + 1
    for it, c in counts.items():
        true = stream.count(it)
        assert c <= true and true - c <= 7 // 3 + 1


def test_heavy_hitters_spark_exact_small_vocab(spark, sf_dir):
    """k=256 >> vocab(31): the sketch path must equal the exact
    groupBy-count top-20 (same tie-break)."""
    import pyspark.sql.functions as F
    from examples_scala_spark.operators.sketches import heavy_hitters
    from examples_scala_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    got = [(r.token, r.weight)
           for r in heavy_hitters(tokens, "token", k=256, top=20).collect()]
    exact = [(r.token, r.c) for r in
             tokens.groupBy("token").agg(F.count("*").alias("c"))
             .orderBy(F.desc("c"), "token").limit(20).collect()]
    assert got == exact


def test_spark_tree_matches_exact(spark, sf_dir):
    """End-to-end over events: each key's sketched p50/p90/p99 must sit
    within 3% rank error of the key's exact values, and n must be the
    exact group count (weights are conserved through both levels)."""
    from examples_scala_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {r["event_type"]: r for r in
           tdigest_quantiles(ev, "event_type", "value",
                             [0.5, 0.9, 0.99]).collect()}
    pdf = ev.select("event_type", "value").toPandas()
    for etype, grp in pdf.groupby("event_type"):
        vals = grp["value"].to_numpy()
        row = got[etype]
        assert row["n"] == len(vals)
        for p, col in [(0.5, "q50"), (0.9, "q90"), (0.99, "q99")]:
            assert _rank_error(vals, row[col], p) < 0.03, (etype, col)


def test_hll_rollup_union_tolerance(spark):
    """Default-lgk sketches at 100k distincts: union of bucketed
    partials must land within 5% of the exact distinct count
    (lgk=12 std error is 1.04/sqrt(2^12) ~ 1.6%; 5% is ~3 sigma)."""
    from pyspark.sql import functions as F
    from examples_scala_spark.operators.sketches import (
        hll_partials, hll_rollup)
    df = spark.range(300_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 20).alias("bucket"),
        (F.col("id") % 100_000).alias("u"))
    parts = hll_partials(df, ["g"], F.col("bucket"), "u", lgk=12)
    got = {r["g"]: r["est_distinct"] for r in
           hll_rollup(parts, ["g"]).collect()}
    exact = {r["g"]: r["ex"] for r in
             df.groupBy("g").agg(F.count_distinct("u").alias("ex")).collect()}
    for g, ex in exact.items():
        assert abs(got[g] - ex) / ex < 0.05, (g, got[g], ex)


def test_cms_exact_when_width_covers_domain_and_bounded_when_not(spark):
    from examples_scala_spark.operators.sketches import cms_counts
    import pyspark.sql.functions as F
    # 20 distinct tokens, zipf-ish counts
    rows = [(f"t{i}",) for i in range(20) for _ in range(i + 1)]
    tokens = spark.createDataFrame(rows, "term string")
    probes = [f"t{i}" for i in range(0, 20, 4)] + ["absent"]
    # wide sketch: collisions vanish -> estimates exactly equal counts
    wide = cms_counts(tokens, "term", probes, d=4, w=4096).collect()
    for r in wide:
        assert r["cms_est"] == r["exact_cnt"], r
        assert r["within_bound"]
    # deliberately tiny sketch: still one-sided and within 2N/w
    tiny = cms_counts(tokens, "term", probes, d=4, w=8).collect()
    n = len(rows)
    for r in tiny:
        assert r["cms_est"] >= r["exact_cnt"]
        assert r["cms_est"] - r["exact_cnt"] <= 2 * n / 8
        assert r["within_bound"]
