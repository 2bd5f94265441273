"""Property-based tests (hypothesis) for the pure arithmetic cores of
the round-2 operators: packing math and bottom-k merge. These run
WITHOUT Spark — the properties are engine-independent, which is the
point: the Spark plans and the DuckDB oracles both implement exactly
this arithmetic."""

from __future__ import annotations

from hypothesis import example, given, settings
from hypothesis import strategies as st


# ------------------------------------------------------------- packing math

def pack(records: list[tuple[int, int]], budget: int, n_buckets: int,
         stride: int = 1 << 32):
    """Reference (driver-side) implementation of pack_sequences: records
    are (id, n_tokens)."""
    out = {}
    cums = {}
    for rid, ntok in sorted(records):
        b = rid % n_buckets
        cum = cums.get(b, 0)
        out[rid] = (b, cum % budget, b * stride + cum // budget)
        cums[b] = cum + ntok
    return out


@given(
    recs=st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(0, 5000)),
        unique_by=lambda t: t[0], max_size=200),
    budget=st.integers(1, 512),
    n_buckets=st.integers(1, 64),
)
@settings(max_examples=200, deadline=None)
def test_packing_invariants(recs, budget, n_buckets):
    out = pack(recs, budget, n_buckets)
    per_bucket: dict[int, list[tuple[int, int, int]]] = {}
    for rid, (b, off, pid) in out.items():
        assert 0 <= off < budget
        assert pid >> 32 == b
        per_bucket.setdefault(b, []).append((rid, off, pid))
    for b, rows in per_bucket.items():
        rows.sort()
        # pack ids never decrease along the bucket order, and the
        # local pack number advances exactly with consumed budget
        tokens = {rid: n for rid, n in recs}
        cum = 0
        for rid, off, pid in rows:
            assert pid - (b << 32) == cum // budget
            assert off == cum % budget
            cum += tokens[rid]


@given(
    recs=st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(0, 5000)),
        unique_by=lambda t: t[0], min_size=1, max_size=100),
    budget=st.integers(1, 256),
)
@settings(max_examples=100, deadline=None)
def test_packing_budget_conservation(recs, budget):
    """Within one bucket, every pack except the last receives exactly
    `budget` tokens of coverage (docs straddle boundaries — that's the
    concat-and-chunk contract)."""
    out = pack(recs, budget, n_buckets=1)
    tokens = dict(recs)
    total = sum(tokens.values())
    n_packs = len({pid for _, _, pid in out.values()
                   }) if total else len(out) and 1
    # the highest pack index equals floor(cum_before_last / budget)
    rids = sorted(tokens)
    cum_before_last = sum(tokens[r] for r in rids[:-1])
    assert max(pid for _, _, pid in out.values()) == cum_before_last // budget
    assert n_packs >= 1


# -------------------------------------------------------- bottom-k merging

def bottom_k(items: list[int], k: int) -> list[int]:
    return sorted(items)[:k]


@given(
    parts=st.lists(st.lists(st.integers(0, 10**6), max_size=100),
                   min_size=1, max_size=8),
    k=st.integers(1, 20),
)
@settings(max_examples=200, deadline=None)
def test_bottom_k_merge_property(parts, k):
    """The property stratified_reservoir's two-stage plan relies on:
    bottom-k of the union == bottom-k of the concatenated per-partition
    bottom-k candidate sets. If this held only approximately, the
    Arrow pruning stage would change the sample."""
    pruned = [x for p in parts for x in bottom_k(p, k)]
    everything = [x for p in parts for x in p]
    assert bottom_k(pruned, k) == bottom_k(everything, k)


# ----------------------------------------------------------- CDC semantics

def apply_ref(snapshot: dict, changes: list[tuple]) -> dict:
    """Reference sequential CDC apply: changes are (key, op, value, seq);
    replay in seq order over the snapshot dict."""
    out = dict(snapshot)
    for key, op, value, _seq in sorted(changes, key=lambda c: c[3]):
        if op == "delete":
            out.pop(key, None)
        else:
            out[key] = value
    return out


def apply_lww(snapshot: dict, changes: list[tuple]) -> dict:
    """The operator's plan: last-write-wins per key, applied once —
    what operators/cdc.py:apply_changelog computes distributively."""
    latest: dict = {}
    for key, op, value, seq in changes:
        if key not in latest or seq > latest[key][2]:
            latest[key] = (op, value, seq)
    out = {k: v for k, v in snapshot.items() if k not in latest}
    for key, (op, value, _seq) in latest.items():
        if op == "upsert":
            out[key] = value
    return out


@given(
    snap=st.dictionaries(st.integers(0, 30), st.integers(), max_size=20),
    changes=st.lists(
        st.tuples(st.integers(0, 30),
                  st.sampled_from(["upsert", "delete"]),
                  st.integers(),
                  st.integers(0, 10**6)),
        unique_by=lambda c: c[3], max_size=60),
)
@settings(max_examples=300, deadline=None)
def test_lww_apply_equals_sequential_replay(snap, changes):
    """Collapsing a changelog to last-write-wins per key and applying
    once must equal replaying every entry in order — the property that
    lets apply_changelog do one window + one anti-join instead of a
    sequential scan. (Unique seq per entry: the operator requires a
    total order, which the query provides via (us, event_id).)"""
    assert apply_lww(snap, changes) == apply_ref(snap, changes)


# ---------------------------------------------------- round-3 arithmetic

def two_phase_select(rows, budget):
    """Reference of selection.budget_prefix_select: rows are
    (bucket, order_key, weight)."""
    hist: dict[int, int] = {}
    for b, _, w in rows:
        hist[b] = hist.get(b, 0) + w
    cum, full, cutoff, spent = 0, set(), None, 0
    for b in sorted(hist):
        if cum + hist[b] <= budget:
            full.add(b)
            cum += hist[b]
        else:
            cutoff, spent = b, cum
            break
    keep = [(b, o) for b, o, _ in rows if b in full]
    if cutoff is not None:
        c = spent
        for b, o, w in sorted(r for r in rows if r[0] == cutoff):
            c += w
            if c <= budget:
                keep.append((b, o))
    return sorted(keep)


def naive_prefix_select(rows, budget):
    keep, cum = [], 0
    for b, o, w in sorted(rows):
        cum += w
        if cum <= budget:
            keep.append((b, o))
    return sorted(keep)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 10**6),
                  st.integers(1, 50)),
        unique_by=lambda t: t[1], max_size=150),
    budget=st.integers(0, 2000),
)
@settings(max_examples=200, deadline=None)
def test_two_phase_budget_select_equals_naive_prefix(rows, budget):
    # positive weights => inclusive cumsum strictly increases => the
    # bucket histogram cut + cutoff-bucket window is the exact prefix
    assert two_phase_select(rows, budget) == naive_prefix_select(rows, budget)


def interleave(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@given(st.integers(0, 255), st.integers(0, 255))
@settings(max_examples=200, deadline=None)
def test_zorder_interleave_is_bijective_and_monotone_on_axes(x, y):
    z = interleave(x, y, 8)
    # invertible: de-interleave recovers both coordinates
    xr = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    yr = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (xr, yr) == (x, y)
    assert 0 <= z < 1 << 16
    # axis monotonicity of the high bit: doubling a coordinate's top
    # bit always raises the key (locality of the curve's quadrants)
    if x < 128:
        assert interleave(x + 128, y, 8) > z
    if y < 128:
        assert interleave(x, y + 128, 8) > z


P31 = 2_147_483_647


def cms_estimate(stream: list[int], probe: int, d: int, w: int) -> int:
    from examples_scala_spark.operators.dedup import _hash_params
    params = _hash_params(d)
    cells: dict[tuple[int, int], int] = {}
    for x in stream:
        for i, (a, b) in enumerate(params):
            cells[(i, (a * (x % P31) + b) % P31 % w)] = \
                cells.get((i, (a * (x % P31) + b) % P31 % w), 0) + 1
    return min(cells.get((i, (a * (probe % P31) + b) % P31 % w), 0)
               for i, (a, b) in enumerate(params))


@given(
    stream=st.lists(st.integers(0, 2**50), max_size=300),
    probe=st.integers(0, 2**50),
    w=st.sampled_from([8, 64, 512]),
)
@settings(max_examples=100, deadline=None)
def test_cms_is_one_sided(stream, probe, w):
    true = stream.count(probe)
    assert cms_estimate(stream, probe, d=4, w=w) >= true


def snapshot_diff_model(old: dict, new: dict) -> dict:
    out = {}
    for k in set(old) | set(new):
        if k not in old:
            out[k] = ("insert", new[k])
        elif k not in new:
            out[k] = ("delete", None)
        elif old[k] != new[k]:
            out[k] = ("update", new[k])
    return out


@given(
    old=st.dictionaries(st.integers(0, 30),
                        st.one_of(st.none(), st.integers(0, 5)), max_size=30),
    new=st.dictionaries(st.integers(0, 30),
                        st.one_of(st.none(), st.integers(0, 5)), max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_snapshot_diff_applied_to_old_yields_new(old, new):
    rebuilt = dict(old)
    for k, (op, v) in snapshot_diff_model(old, new).items():
        if op == "delete":
            rebuilt.pop(k, None)
        else:
            rebuilt[k] = v
    assert rebuilt == new


# --------------------------------------------------- ordered_batch (round 4)

@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1_000_000), st.integers(0, 50)),
        min_size=0, max_size=120),
    chunking=st.lists(st.integers(1, 17), min_size=1, max_size=40),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_ordered_batch_equals_global_sort_under_any_chunking(
        rows, chunking, data):
    """streaming/stateful.py:ordered_batch must yield the globally
    (ts, event_id)-sorted micro-batch no matter how the rows are split
    into Arrow chunks or how those chunks are permuted — the exact
    invariant the event-ordered replay oracles depend on (ADVICE r3
    item 1). Mergesort keeps equal keys in concat order, so ties on
    the sort key are also deterministic given the chunk order."""
    import pandas as pd

    from examples_scala_spark.streaming.stateful import ordered_batch

    df = pd.DataFrame(rows, columns=["event_id", "ts"])
    # arbitrary contiguous chunking, then an arbitrary permutation of
    # the chunks (shuffle-arrival order)
    chunks, i = [], 0
    for size in chunking:
        if i >= len(df):
            break
        chunks.append(df.iloc[i:i + size])
        i += size
    if i < len(df):
        chunks.append(df.iloc[i:])
    perm = data.draw(st.permutations(range(len(chunks))))
    shuffled = [chunks[j] for j in perm]
    # some empty chunks sprinkled in (SS emits them)
    shuffled.insert(0, df.iloc[0:0])
    shuffled.append(df.iloc[0:0])

    got = ordered_batch(iter(shuffled), ["ts", "event_id"])
    if not len(df):
        assert got is None
        return
    expect = df.sort_values(["ts", "event_id"], kind="mergesort")
    assert list(got["event_id"]) == list(expect["event_id"])
    assert list(got["ts"]) == list(expect["ts"])


# ------------------------------------------------- verifier hash invariants

@given(
    rows=st.lists(st.tuples(st.integers(-10, 10), st.floats(
        allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=5)), min_size=0, max_size=40),
    data=st.data(),
)
@settings(max_examples=150, deadline=None)
def test_value_hash_insensitive_to_row_and_column_order(rows, data):
    """tools/verify_local.value_hash — the local twin of the driver's
    comparator — must be invariant to row order and column order (it
    sorts columns by name, then rows by repr), and sensitive to an
    actual value change."""
    import sys
    from pathlib import Path

    import pandas as pd

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from verify_local import value_hash

    df = pd.DataFrame(rows, columns=["a", "b", "c"])
    perm_rows = data.draw(st.permutations(range(len(df))))
    perm_cols = data.draw(st.permutations(["a", "b", "c"]))
    shuffled = df.iloc[list(perm_rows)][list(perm_cols)]
    assert value_hash(df) == value_hash(shuffled)
    if len(df):
        mutated = df.copy()
        mutated.loc[mutated.index[0], "a"] = 99  # outside the domain
        assert value_hash(mutated) != value_hash(df)


@given(
    w=st.integers(min_value=1, max_value=37),
    h=st.integers(min_value=1, max_value=23),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_bmp_codec_roundtrip_property(w, h, seed):
    """encode_bmp -> decode_bmp is the identity for EVERY geometry —
    all four row-padding residues, 1-pixel edges, arbitrary content —
    and the encoded size matches the BMP closed form."""
    import numpy as np

    from examples_scala_spark.operators.multimodal import (
        decode_bmp, encode_bmp)

    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_bmp(px)
    assert len(data) == 54 + ((3 * w + 3) // 4 * 4) * h
    got_w, got_h, got = decode_bmp(data)
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(got, px)


@given(
    n=st.integers(min_value=1, max_value=257),
    rate=st.integers(min_value=1, max_value=192_000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_codec_roundtrip_property(n, rate, seed):
    """encode_wav -> decode_wav is the identity for every length
    (odd data-chunk sizes included), any sample rate, and full-range
    int16 content; the container size matches the RIFF closed form."""
    import numpy as np

    from examples_scala_spark.operators.multimodal import (
        decode_wav, encode_wav)

    s = np.random.default_rng(seed).integers(
        -32768, 32768, size=n, dtype=np.int16)
    data = encode_wav(s, rate)
    assert len(data) == 12 + 8 + 16 + 8 + 2 * n
    got_rate, ch, got = decode_wav(data)
    assert (got_rate, ch) == (rate, 1)
    assert np.array_equal(got, s)


# ------------------------------------------- BPE double-replace merge

def _greedy_merge(sym: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right non-overlapping pair merge —
    Sennrich's substitution semantics."""
    out, i = [], 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


@given(
    syms=st.lists(st.sampled_from(["a", "b", "c", "ab", "bc", "_", "aa"]),
                  min_size=0, max_size=30),
    pair=st.tuples(st.sampled_from(["a", "b", "c", "ab", "bc", "_", "aa"]),
                   st.sampled_from(["a", "b", "c", "ab", "bc", "_", "aa"])),
)
@settings(max_examples=500, deadline=None)
@example(syms=["a", "a", "a", "a", "a"], pair=("a", "a"))
def test_bpe_single_replace_equals_greedy_merge(syms, pair):
    """The trainer substitutes ' a  b ' -> ' ab ' with ONE string
    replace pass over DOUBLE-space-joined symbols
    (operators/text.py:_bpe_loop): each match consumes the inner
    delimiter fully but only one space of each outer delimiter, so
    back-to-back occurrences stay matchable and the left-to-right
    scan IS greedy merging. The superseded single-space double-replace
    form mis-merged self-pair runs >= 5 (hypothesis found
    ['a']*5 + (a,a) -> [aa, a, aa] instead of greedy [aa, aa, a] —
    kept as the explicit @example). Proven here over all small symbol
    strings, including multi-char symbols embedding the pair's
    characters; a second pass must change nothing."""
    a, b = pair
    s = "  " + "  ".join(syms) + "  " if syms else "    "
    pat, rep = f" {a}  {b} ", f" {a}{b} "
    once = s.replace(pat, rep)
    got = [t for t in once.split(" ") if t]
    assert got == _greedy_merge(syms, a, b)
    assert once.replace(pat, rep) == once  # idempotent after one
