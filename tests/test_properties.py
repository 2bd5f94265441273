"""Property-based tests (hypothesis) for the pure arithmetic cores of
the round-2 operators: packing math and bottom-k merge. These run
WITHOUT Spark — the properties are engine-independent, which is the
point: the Spark plans and the DuckDB oracles both implement exactly
this arithmetic."""

from __future__ import annotations

from hypothesis import given, settings
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
