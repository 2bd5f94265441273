"""VERDICT r5 #7: nano-unit log/exp oracle stability under libm drift.

Five registry queries (events_decayed_counts, doc_bigram_logppl,
events_psi_drift, source_zipf_slope, source_token_entropy) round a
ln/exp result ONCE to integer nano-units in both engines, then
accumulate exactly in integers — so the only way Spark's JVM libm and
DuckDB's C libm can diverge is a 1-ulp difference in the ln/exp output
landing exactly on a .5 rounding boundary and flipping one unit.

These tests recompute every pre-round term of every query on the real
corpus (sf0.001 AND sf0.01 — the driver's gate scale), perturb the
ln/exp result by ±1 ulp (and, where a log-constant like ln 2 enters the
argument, the argument too), and assert the rounded nano-unit integer
is UNCHANGED for every term. Downstream of the units both engines do
exact integer arithmetic and the final 6-decimal round is computed
from identical doubles, so term-level stability implies hash
stability. Data pulls run in DuckDB only — no Spark session needed.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _round_half_away(v: np.ndarray) -> np.ndarray:
    # SQL round(): half away from zero (numpy rint is half-to-even)
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))


def _assert_units_stable(f: np.ndarray, what: str,
                         scale: float = 1e9) -> None:
    """round(f*scale) must not move when f shifts by 1 ulp either way."""
    f = np.asarray(f, dtype=np.float64)
    base = _round_half_away(f * scale)
    for g in (np.nextafter(f, np.inf), np.nextafter(f, -np.inf)):
        r = _round_half_away(g * scale)
        bad = np.flatnonzero(r != base)
        assert bad.size == 0, (
            f"{what}: {bad.size}/{f.size} terms flip a nano-unit under a "
            f"1-ulp libm perturbation; first offenders f="
            f"{f[bad[:5]].tolist()} — the oracle is NOT hash-stable on "
            f"this corpus; widen the unit granularity or pre-fold the "
            f"constants")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_decayed_counts_units_ulp_stable(sf_dir):
    """events_decayed_counts: units = round(exp(-ln2·Δt/day)·1e9).
    Perturbs both the exp output and the ln(2) constant inside the
    argument (DuckDB evaluates ln(2) at runtime; Spark bakes
    math.log(2) as a literal — they could differ by 1 ulp)."""
    con = _con(sf_dir)
    d = con.sql(
        "WITH mx AS (SELECT max(epoch_us(ts)) AS t_end FROM events) "
        "SELECT DISTINCT (t_end - epoch_us(ts))::DOUBLE AS d "
        "FROM events CROSS JOIN mx").df()["d"].to_numpy()
    ln2 = math.log(2)
    for l2 in (ln2, np.nextafter(ln2, 0), np.nextafter(ln2, 1)):
        f = np.exp(-l2 * d / 86400000000.0)
        _assert_units_stable(f, f"decayed_counts(ln2={l2!r})")
    # and the base ln2's exp outputs must agree with the perturbed
    # constants' outputs after rounding (constant drift ≈ output ulp)
    base = _round_half_away(np.exp(-ln2 * d / 86400000000.0) * 1e9)
    for l2 in (np.nextafter(ln2, 0), np.nextafter(ln2, 1)):
        r = _round_half_away(np.exp(-l2 * d / 86400000000.0) * 1e9)
        assert (r == base).all(), "ln(2) constant drift flips a unit"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bigram_logppl_units_ulp_stable(sf_dir):
    """doc_bigram_logppl: lp_units = round(ln(c12/c1)·1e9) per bigram."""
    con = _con(sf_dir)
    df = con.sql(r"""
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
          FROM documents),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(1, greatest(len(words) - 1, 0) + 1),
                   i -> array_to_string(list_slice(words, i, i + 1), ' ')))
                   AS bigram
          FROM w),
        dbc AS (SELECT doc_id, bigram, count(*)::BIGINT AS cnt
                FROM bg GROUP BY 1, 2),
        lm AS (SELECT bigram, sum(cnt)::BIGINT AS c12 FROM dbc GROUP BY 1)
        SELECT DISTINCT c12,
               sum(c12) OVER (PARTITION BY string_split(bigram, ' ')[1])
                 AS c1
        FROM lm""").df()
    f = np.log(df["c12"].to_numpy(np.float64) / df["c1"].to_numpy(np.float64))
    _assert_units_stable(f, "bigram_logppl")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_psi_drift_units_ulp_stable(sf_dir):
    """events_psi_drift: psi_units = round((p0−p1)·ln(p0/p1)·1e9).
    Perturbs the ln output; the smoothed shares and their difference
    are IEEE-exact identical across engines given integer inputs."""
    con = _con(sf_dir)
    df = con.sql("""
        WITH mx AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
                    FROM events),
        c AS (
          SELECT event_type,
                 CASE WHEN epoch_us(ts) * 2 < lo + hi THEN 0 ELSE 1 END
                   AS half,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events CROSS JOIN mx),
        qs AS (SELECT quantile_cont(cents, 0.25) AS q1,
                      quantile_cont(cents, 0.5) AS q2,
                      quantile_cont(cents, 0.75) AS q3 FROM c),
        b AS (
          SELECT event_type, half,
                 CASE WHEN cents <= q1 THEN 0 WHEN cents <= q2 THEN 1
                      WHEN cents <= q3 THEN 2 ELSE 3 END AS band
          FROM c CROSS JOIN qs),
        cell AS (
          SELECT event_type, band,
                 sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
                 sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS n1
          FROM b GROUP BY 1, 2)
        SELECT n0, n1,
               sum(n0) OVER (PARTITION BY event_type) AS nt0,
               sum(n1) OVER (PARTITION BY event_type) AS nt1
        FROM cell""").df()
    p0 = (df["n0"].to_numpy(np.float64) + 0.5) / (df["nt0"].to_numpy(np.float64) + 2.0)
    p1 = (df["n1"].to_numpy(np.float64) + 0.5) / (df["nt1"].to_numpy(np.float64) + 2.0)
    diff, ln = p0 - p1, np.log(p0 / p1)
    base = _round_half_away(diff * ln * 1e9)
    for g in (np.nextafter(ln, np.inf), np.nextafter(ln, -np.inf)):
        r = _round_half_away(diff * g * 1e9)
        assert (r == base).all(), "psi term flips a unit under 1-ulp ln drift"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_zipf_slope_units_ulp_stable(sf_dir):
    """source_zipf_slope: x/y = round(ln(rank)·1e9), round(ln(c)·1e9).
    Ranks are 1..vocab and counts are small integers, so one pull of
    the distinct values covers every term."""
    con = _con(sf_dir)
    df = con.sql(r"""
        WITH cnt AS (
          SELECT source, w, count(*)::BIGINT AS c FROM (
            SELECT source, unnest(string_split_regex(trim(text), '\s+'))
              AS w FROM documents) GROUP BY 1, 2),
        rk AS (
          SELECT source, c,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY c DESC, w) AS rank
          FROM cnt)
        SELECT DISTINCT rank::DOUBLE AS r, c::DOUBLE AS c FROM rk""").df()
    vals = np.unique(np.concatenate(
        [df["r"].to_numpy(np.float64), df["c"].to_numpy(np.float64)]))
    _assert_units_stable(np.log(vals), "zipf_slope ln(rank)/ln(c)")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_token_entropy_units_ulp_stable(sf_dir):
    """source_token_entropy (same nano-unit pattern, covered for
    completeness): lp_units = round(ln(c/n)·1e9) per (source, word)."""
    con = _con(sf_dir)
    df = con.sql(r"""
        WITH cnt AS (
          SELECT source, w, count(*)::BIGINT AS c FROM (
            SELECT source, unnest(string_split_regex(trim(text), '\s+'))
              AS w FROM documents) GROUP BY 1, 2)
        SELECT DISTINCT c::DOUBLE AS c,
               (sum(c) OVER (PARTITION BY source))::DOUBLE AS n
        FROM cnt""").df()
    f = np.log(df["c"].to_numpy(np.float64) / df["n"].to_numpy(np.float64))
    _assert_units_stable(f, "token_entropy ln(c/n)")
