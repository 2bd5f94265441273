"""Mergeable quantile sketch (t-digest-style) as a two-level pandas
UDAF tree — the custom-accumulator surface of SURVEY §2.12: the
reference's `AggregateFunction` contract (createAccumulator / add /
merge / getResult, chapter6/WindowFunctions.scala:87-105) where the
accumulator is a bounded set of weighted centroids instead of a
(sum, count) pair.

Scale design (the point of a sketch): quantiles over 100 TB cannot
sort, and a hot key cannot funnel all its values through one task.
Stage 1 groups by (key, salt) — salt = hash(value) % fanout — so each
partial digest sees ~1/fanout of a key's rows and compresses them to
<= ~2*delta centroids (KB, regardless of input rows). Stage 2 merges
the fanout partial digests per key (concatenate centroids, re-compress)
and interpolates the requested quantiles. Both stages are Arrow-batched
pandas ops; shuffled bytes are O(keys * fanout * delta), independent of
row count — the same partial/final shape Catalyst uses for sum/avg.

Determinism: compression sorts by value (numpy mergesort, stable) and
merges greedily under the t-digest scale-function capacity, so a
retried task reproduces the identical digest bit-for-bit — no RNG
anywhere. Estimates are approximate (rank error concentrated at the
tails per the scale function k(q) = delta/2pi * asin(2q-1)); exactness
is tested as rank-error bounds, not value equality, hence the registry
entry carries an error-bound oracle (rank error vs the exact
quantile; no SQL oracle can reproduce the algorithm itself).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _k(q: float, delta: int) -> float:
    """t-digest scale function k_1 (Dunning): tail-biased capacity."""
    return delta / (2 * math.pi) * math.asin(2 * min(max(q, 0.0), 1.0) - 1)


def compress(values: np.ndarray, weights: np.ndarray,
             delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right centroid merge under the k_1 size limit.
    Input need not be sorted; output is sorted by centroid mean with
    at most ~2*delta centroids. Pure function of (multiset, delta)."""
    order = np.argsort(values, kind="mergesort")
    values, weights = values[order], weights[order]
    total = float(weights.sum())
    out_v: list[float] = []
    out_w: list[float] = []
    acc_v, acc_w, seen = values[0] * weights[0], float(weights[0]), 0.0
    for v, w in zip(values[1:], weights[1:]):
        q0 = seen / total
        q1 = (seen + acc_w + w) / total
        if _k(q1, delta) - _k(q0, delta) <= 1.0:
            acc_v += v * w
            acc_w += w
        else:
            out_v.append(acc_v / acc_w)
            out_w.append(acc_w)
            seen += acc_w
            acc_v, acc_w = v * w, float(w)
    out_v.append(acc_v / acc_w)
    out_w.append(acc_w)
    return np.asarray(out_v), np.asarray(out_w)


def quantile(cent_v: np.ndarray, cent_w: np.ndarray, q: float) -> float:
    """Interpolate quantile q from sorted centroids: each centroid's
    mean sits at the midpoint of its weight span (standard t-digest
    single-pass inverse CDF)."""
    total = cent_w.sum()
    target = q * total
    cum = np.cumsum(cent_w) - cent_w / 2.0
    if target <= cum[0]:
        return float(cent_v[0])
    if target >= cum[-1]:
        return float(cent_v[-1])
    i = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(cent_v[i] + frac * (cent_v[i + 1] - cent_v[i]))


def tdigest_quantiles(df: DataFrame, key: str, col: str,
                      probs: list[float], delta: int = 100,
                      fanout: int = 16) -> DataFrame:
    """Per-key approximate quantiles via the two-level digest tree.
    Returns one row per key: (key, n, q_50-style columns per prob)."""
    probs = list(probs)
    partial_schema = f"{key} string, cent_v array<double>, cent_w array<double>"

    def build_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[col].to_numpy(dtype=np.float64)
        cv, cw = compress(v, np.ones_like(v), delta)
        return pd.DataFrame({key: [pdf[key].iloc[0]],
                             "cent_v": [cv.tolist()],
                             "cent_w": [cw.tolist()]})

    qcols = ", ".join(f"q{int(p * 100):02d} double" for p in probs)
    final_schema = f"{key} string, n bigint, {qcols}"

    def merge_final(pdf: pd.DataFrame) -> pd.DataFrame:
        cv = np.concatenate([np.asarray(x) for x in pdf["cent_v"]])
        cw = np.concatenate([np.asarray(x) for x in pdf["cent_w"]])
        cv, cw = compress(cv, cw, delta)
        row = {key: pdf[key].iloc[0], "n": int(round(cw.sum()))}
        for p in probs:
            row[f"q{int(p * 100):02d}"] = quantile(cv, cw, p)
        return pd.DataFrame([row])

    salted = df.select(key, col).withColumn(
        "__salt", F.pmod(F.hash(F.col(col)), F.lit(fanout)))
    partials = salted.groupBy(key, "__salt").applyInPandas(
        build_partial, partial_schema)
    return partials.groupBy(key).applyInPandas(merge_final, final_schema)


def misra_gries(counts: dict[str, int], item: str, w: int, k: int) -> None:
    """One Misra-Gries update: add item with weight w, keeping at most
    k counters; overflow decrements all counters by the evicted
    minimum. Counts are lower bounds with error <= total_weight/(k+1);
    EXACT whenever distinct items in the stream <= k (no decrement ever
    happens)."""
    if item in counts:
        counts[item] += w
        return
    if len(counts) < k:
        counts[item] = w
        return
    m = min(min(counts.values()), w)
    for it in list(counts):
        counts[it] -= m
        if counts[it] == 0:
            del counts[it]
    if w > m:
        counts[item] = w - m


def heavy_hitters(tokens: DataFrame, col: str, k: int = 256,
                  top: int = 20) -> DataFrame:
    """Approximate top-`top` heavy hitters over a token column via a
    per-partition Misra-Gries summary (<= k counters each, built in
    Arrow batches with mapInPandas) merged by a single tiny shuffle.

    Scale story: exact top-k over 100 TB shuffles every (token, count)
    pair — fine for a 31-term vocab, catastrophic for a web-scale
    vocabulary. Here the shuffle carries <= k * numPartitions candidate
    rows regardless of input size (map-side candidate pruning, the
    sketch analogue of partial aggregation); summed MG weights remain
    valid lower bounds with total error <= total/(k+1) per partition.
    With distinct(tokens-per-partition) <= k the result is exact —
    which the tests exploit. Tokenization stays JVM-side; Python only
    maintains the counter dict."""
    import pandas as pd

    def summarize(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[col]:
                misra_gries(counts, item, 1, k)
        if counts:
            yield pd.DataFrame({col: list(counts),
                                "weight": list(counts.values())})

    partials = tokens.select(col).mapInPandas(
        summarize, f"{col} string, weight long")
    return (partials.groupBy(col)
            .agg(F.sum("weight").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), col).limit(top))


def hll_partials(df, keys: list[str], bucket, value_col: str,
                 lgk: int = 14):
    """Mergeable distinct-count partials: one Datasketches HLL sketch
    per (keys..., bucket) — the storable/rollupable form of
    count_distinct. Partials are tiny (<= 2^lgk bytes) and union
    losslessly, so daily sketches roll up to monthly/all-time without
    touching the fact table again — count_distinct can never do that
    (distinct is not mergeable; sketches are the 100 TB answer)."""
    from pyspark.sql import functions as F
    return (df.groupBy(*keys, bucket)
            .agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sk")))


def hll_rollup(partials, keys: list[str]):
    """Union stored partials up one level and estimate. At lgk=14 the
    sketch is exact through ~10k distincts (sparse mode) and ~0.8%
    relative error beyond; raising lgk buys accuracy with 2^lgk-byte
    partials."""
    from pyspark.sql import functions as F
    return (partials.groupBy(*keys)
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                 .alias("est_distinct")))


def cms_counts(tokens: DataFrame, col: str, probes: list[str],
               d: int = 4, w: int = 512) -> DataFrame:
    """Count-min sketch point-count estimates for `probes`, built as
    PURE DataFrame ops — no Python in the path: the sketch table IS a
    d x w cell aggregate (one explode into d (row, pos) cells + one
    groupBy), mergeable across any partitioning by construction; the
    estimate is min over rows of the probed cell.

    CMS guarantees (deterministic here — hashes are fixed universal
    params shared with the oracle): est >= true always, and
    est - true <= 2N/w with prob >= 1 - 2^-d per probe. Shuffle volume
    is d*w cells regardless of token count — the additive counterpart
    of the HLL/Misra-Gries partials. Returns
    (term, exact_cnt, cms_est, within_bound)."""
    from .dedup import P, _hash_params, base_hash

    params = _hash_params(d)
    x = (base_hash(F.col(col)) % P).alias("x")
    cells_expr = F.explode(F.array(*[
        F.struct(F.lit(i).alias("i"),
                 (((F.lit(a) * F.col("x") + F.lit(b)) % P) % w).alias("pos"))
        for i, (a, b) in enumerate(params)])).alias("cell")
    sketch = (tokens.select(x).select(cells_expr)
              .select("cell.i", "cell.pos")
              .groupBy("i", "pos").agg(F.count("*").alias("c")))

    n_total = tokens.select(F.count("*").cast("double").alias("N"))
    probe_df = tokens.sparkSession.createDataFrame(
        [(t,) for t in probes], f"{col} string")
    probe_cells = (probe_df.select(F.col(col), x).select(col, cells_expr)
                   .select(col, "cell.i", "cell.pos"))
    est = (probe_cells.join(sketch, ["i", "pos"], "left")
           .groupBy(col)
           .agg(F.min(F.coalesce("c", F.lit(0))).cast("bigint")
                .alias("cms_est")))
    exact = (tokens.filter(F.col(col).isin(probes))
             .groupBy(col).agg(F.count("*").alias("exact_cnt")))
    return (est.join(exact, col, "left")
            .withColumn("exact_cnt",
                        F.coalesce("exact_cnt", F.lit(0)).cast("bigint"))
            .crossJoin(F.broadcast(n_total))
            .select(F.col(col), "exact_cnt", "cms_est",
                    ((F.col("cms_est") >= F.col("exact_cnt"))
                     & ((F.col("cms_est") - F.col("exact_cnt"))
                        <= 2.0 * F.col("N") / w)).alias("within_bound")))


# ----------------------------------------------------------------------
# KLL quantile sketch (Karnin-Lang-Liberty 2016) — the production
# standard (Apache DataSketches) next to the t-digest above. Same
# partial/merge contract, different accumulator: a hierarchy of
# compactors where an item at level h carries weight 2^h; an
# over-full level sorts, keeps every other item (offset drawn
# deterministically from the md5 of level-index || level-content —
# the repo's md5-pseudo-randomness idiom, so a retried task
# reproduces the sketch bit-for-bit), and promotes the kept half one
# level up. Determinism trades away the paper's randomized-coin
# rank-error THEOREM; the empirical rank envelope is asserted at
# runtime by the value_quantile_kll oracle and by adversarial tests.
# Everything is a pure function of the input MULTISET (each level is
# sorted before compaction), so merge is commutative bit-for-bit —
# pinned by test.
# ----------------------------------------------------------------------

def _kll_compact(levels: list[np.ndarray], cap: int) -> list[np.ndarray]:
    """Compact until every level holds <= cap items. Total weight
    sum(2^h * len(level_h)) is preserved exactly: an odd leftover
    (the max) stays at its level; 2m items at weight w become m at 2w."""
    h = 0
    while h < len(levels):
        lv = np.sort(np.asarray(levels[h], dtype=np.float64),
                     kind="mergesort")
        if len(lv) <= cap:
            levels[h] = lv
            h += 1
            continue
        if len(lv) % 2:
            rest, lv = lv[-1:], lv[:-1]
        else:
            rest = lv[:0]
        import hashlib
        # Keep-offset = md5(level index || level content). The level
        # index decorrelates the coin across levels so structured
        # inputs whose levels share content don't all flip the same
        # way (ADVICE r7). Still a pure function of (h, multiset):
        # retried tasks and either merge order reproduce the sketch
        # bit-for-bit. NOTE this remains a DETERMINISTIC variant of
        # KLL — the paper's randomized rank-error guarantee does not
        # formally apply; the registry oracle's runtime rank_err_ok
        # envelope (value_quantile_kll) is the operative guard, and
        # the adversarial-input tests check the bound empirically.
        off = int(hashlib.md5(
            h.to_bytes(4, "little") + lv.tobytes()).hexdigest()[:8], 16) & 1
        promoted = lv[off::2]
        levels[h] = rest
        if h + 1 == len(levels):
            levels.append(promoted)
        else:
            levels[h + 1] = np.concatenate([levels[h + 1], promoted])
        h += 1
    return levels


def kll_build(values: np.ndarray, cap: int = 256) -> list[np.ndarray]:
    return _kll_compact([np.asarray(values, dtype=np.float64)], cap)


def kll_merge(a: list[np.ndarray], b: list[np.ndarray],
              cap: int = 256) -> list[np.ndarray]:
    levels = [
        np.concatenate([
            a[h] if h < len(a) else np.empty(0),
            b[h] if h < len(b) else np.empty(0)])
        for h in range(max(len(a), len(b)))]
    return _kll_compact(levels, cap)


def kll_total_weight(levels: list[np.ndarray]) -> int:
    return int(sum((1 << h) * len(lv) for h, lv in enumerate(levels)))


def kll_quantile(levels: list[np.ndarray], q: float) -> float:
    vals = np.concatenate([np.asarray(lv) for lv in levels])
    wts = np.concatenate([
        np.full(len(lv), 1 << h, dtype=np.int64)
        for h, lv in enumerate(levels)])
    order = np.argsort(vals, kind="mergesort")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    target = q * cum[-1]
    i = int(np.searchsorted(cum, target, side="left"))
    return float(vals[min(i, len(vals) - 1)])


def kll_quantiles(df: DataFrame, key: str, col: str,
                  probs: list[float], cap: int = 256) -> DataFrame:
    """Per-key approximate quantiles via KLL. Two stages, both
    memory-bounded:

    Stage 1 is mapInPandas — one partial sketch per key per ARROW
    BATCH, so no task ever materializes a whole group (an advance on
    the t-digest's applyInPandas partials, whose salt fanout bounds
    but does not cap group size). Shuffled bytes per partial are
    O(cap * levels) doubles regardless of batch rows.

    Stage 2 merges a key's batch-partials levelwise and reads the
    requested quantiles off the weighted item multiset. Sketch error
    is O(1/cap) rank units with cap=256 — comfortably inside the 0.02
    envelope the registry oracle asserts."""
    probs = list(probs)
    partial_schema = f"{key} string, levels array<array<double>>"

    def build_partials(batches):
        for pdf in batches:
            out = []
            for kval, grp in pdf.groupby(key, sort=True):
                lv = kll_build(grp[col].to_numpy(dtype=np.float64), cap)
                out.append({key: kval, "levels": [x.tolist() for x in lv]})
            if out:
                yield pd.DataFrame(out)

    qcols = ", ".join(f"q{int(p * 100):02d} double" for p in probs)
    final_schema = f"{key} string, n bigint, {qcols}"

    def merge_final(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: list[np.ndarray] = []
        for levels in pdf["levels"]:
            acc = kll_merge(acc, [np.asarray(x) for x in levels], cap)
        row = {key: pdf[key].iloc[0], "n": kll_total_weight(acc)}
        for p in probs:
            row[f"q{int(p * 100):02d}"] = kll_quantile(acc, p)
        return pd.DataFrame([row])

    partials = (df.select(key, col)
                .mapInPandas(build_partials, partial_schema))
    return partials.groupBy(key).applyInPandas(merge_final, final_schema)
