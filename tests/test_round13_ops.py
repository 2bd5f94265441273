"""Round-13 focused tests: the engine-exact integer rounding helpers
(ratio6 / ratio6_dec / units6 / sratio6_dec) that convert the
count-ratio F.round tie sites (r12 VERDICT #3 inventory).

The class under test: round(double, 6) splits between Spark
(shortest-decimal-repr half-up) and DuckDB (raw-binary half-up) when
the exact rational terminates at a 6-dp half — reduced denominator
2^7 * 5^j, which count-valued denominators hit. The helpers compute
half-up on the exact rational with one integer quotient, identical on
both engines.
"""
from fractions import Fraction

import duckdb
import pytest
from pyspark.sql import functions as F

from examples_scala_spark.functions.scalar import (
    ratio6, ratio6_dec, sratio6_dec, units6)

RATIO6_SQL = ("((2 * CAST(({a}) AS BIGINT) * 1000000 + ({b}))"
              " // (2 * CAST(({b}) AS BIGINT))) / 1e6")
UNITS6_SQL = ("(CASE WHEN ({x}) < 0 THEN -1 ELSE 1 END)"
              " * ((2 * abs({x})::BIGINT * 1000000 + 1000000000)"
              " // 2000000000) / 1e6")

# (num, den) count-ratio cases: engineered 6-dp half ties (reduced
# denominator 2^7 * 5^j, the r12 class: 208993/3200 = 65.3103125),
# plus plain rationals and edges
RATIO_CASES = [
    (208993, 3200),          # the r12 tie (Spark/DuckDB legacy split)
    (1, 128), (3, 128), (5, 2_000_000), (641, 640), (999, 6400),
    (1, 3), (2, 3), (1, 7), (123456, 789), (0, 5), (7, 1),
    (999999, 1000000), (4_599_999_999_999, 4_600_000_000_000),
    (199, 256), (1000001, 2), (1, 1),
]

SIGNED_UNIT_CASES = [  # nano-units u: round6(u/1e9) ties at u = +-500 mod 1000
    1_234_567_500, -1_234_567_500, 500, -500, 1499, -1499,
    0, 1, -1, 999_999_999_999, -999_999_999_999, 3_000_000_001,
]


def _true_half_up(fr: Fraction) -> float:
    scaled = fr * 10**6
    sign = 1 if scaled >= 0 else -1
    a = abs(scaled)
    return sign * ((a.numerator * 2 + a.denominator)
                   // (2 * a.denominator)) / 1e6


def test_ratio6_exact_and_engine_neutral(spark):
    df = spark.createDataFrame(RATIO_CASES, "a bigint, b bigint")
    got = df.select("a", "b",
                    ratio6(F.col("a"), F.col("b")).alias("r"),
                    ratio6_dec(F.col("a"), F.col("b")).alias("rd"),
                    sratio6_dec(F.col("a"), F.col("b")).alias("rs")
                    ).collect()
    con = duckdb.connect()
    for row in got:
        truth = _true_half_up(Fraction(row.a, row.b))
        assert row.r == truth, (row.a, row.b, row.r, truth)
        assert row.rd == truth and row.rs == truth
        (duck,) = con.execute(
            "SELECT " + RATIO6_SQL.format(a=str(row.a), b=str(row.b))
        ).fetchone()
        assert duck == truth, (row.a, row.b, duck, truth)


def test_ratio6_fixes_the_r12_divergence(spark):
    """The legacy round(double) demonstrably splits between engines on
    the r12 tie value; the integer idiom must not."""
    con = duckdb.connect()
    (legacy_duck,) = con.execute(
        "SELECT round(208993::DOUBLE / 3200, 6)").fetchone()
    legacy_spark = spark.createDataFrame([(1,)], "i int").select(
        F.round(F.lit(208993).cast("double") / 3200, 6)).first()[0]
    assert legacy_spark != legacy_duck  # the class exists
    truth = _true_half_up(Fraction(208993, 3200))
    exact = spark.createDataFrame([(208993, 3200)], "a bigint, b bigint") \
        .select(ratio6(F.col("a"), F.col("b"))).first()[0]
    assert exact == truth == legacy_spark


def test_units6_signed_engine_neutral(spark):
    df = spark.createDataFrame([(u,) for u in SIGNED_UNIT_CASES],
                               "u bigint")
    got = df.select("u", units6(F.col("u")).alias("r"),
                    sratio6_dec(F.col("u"),
                                F.lit(1_000_000_000)).alias("rd")
                    ).collect()
    con = duckdb.connect()
    for row in got:
        truth = _true_half_up(Fraction(row.u, 10**9))
        assert row.r == truth, (row.u, row.r, truth)
        assert row.rd == truth
        (duck,) = con.execute(
            "SELECT " + UNITS6_SQL.format(x=str(row.u))).fetchone()
        assert duck == truth, (row.u, duck, truth)


def test_ratio6_null_propagation(spark):
    df = spark.createDataFrame([(None, 5), (3, None), (3, 0)],
                               "a bigint, b bigint")
    rows = df.select(ratio6(F.col("a"), F.col("b")).alias("r")).collect()
    assert all(r.r is None for r in rows)
    con = duckdb.connect()
    (div0,) = con.execute(
        "SELECT " + RATIO6_SQL.format(a="3", b="0")).fetchone()
    assert div0 is None


def test_lsh_hot_bucket_guard(spark):
    """VERDICT r12 #6: a degenerate band (every doc sharing one band
    hash) produces a quadratic bucket. max_bucket_docs excludes
    oversized buckets from pair generation; pairs that also collide in
    a healthy band survive; default None is byte-identical to before."""
    from examples_scala_spark.operators.dedup import lsh_pairs_from_sigs

    n = 30
    rows = []
    for i in range(n):
        # band 0 (mh_0..3) identical for ALL docs -> one hot bucket of
        # n docs; bands 1-3 unique per doc EXCEPT docs 0/1 which also
        # share band 1 (mh_4..7) — a legitimate near-dup pair
        sig = [7, 7, 7, 7] + [100 + 10 * i + r for r in range(12)]
        if i == 1:
            sig[4:8] = [100, 101, 102, 103]  # doc 0's band 1 (mh_4..7)
        rows.append(tuple([i] + sig))
    schema = "doc_id bigint, " + ", ".join(f"mh_{j} bigint"
                                           for j in range(16))
    sig_df = spark.createDataFrame(rows, schema)

    # threshold 8/16: docs 0/1 share bands 0+1 (8 equal minima);
    # hot-bucket-only pairs share just band 0 (4 equal minima)
    unguarded = lsh_pairs_from_sigs(sig_df, threshold=0.25).collect()
    assert len(unguarded) == n * (n - 1) // 2  # the quadratic bucket

    guarded = lsh_pairs_from_sigs(sig_df, threshold=0.25,
                                  max_bucket_docs=10).collect()
    assert [(r.doc_a, r.doc_b) for r in guarded] == [(0, 1)]
    # the surviving pair's similarity is unchanged by the guard
    (full,) = [r for r in unguarded if (r.doc_a, r.doc_b) == (0, 1)]
    (kept,) = guarded
    assert kept.sig_sim == full.sig_sim

    # default None stays byte-identical
    default = lsh_pairs_from_sigs(sig_df, threshold=0.25).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, unguarded))
