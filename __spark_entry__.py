"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship windowed-average query at sf0.001 (smoke).
queries()    — every implemented operator from SURVEY.md §2 + the
               LLM-pipeline surface, as (spark, sf_dir) -> DataFrame.
oracle_sql() — DuckDB-equivalent SQL per query (same column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from examples_scala_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: chapter-1 windowed average (SURVEY §3.1) on sf0.001."""
    return REGISTRY["w_avg_temp"].fn(spark, "/root/testdata/sf0.001")


# The per-round correctness gate evaluates queries in dict order with a
# bounded budget (~50 per round). Cumulative state after r8: all 260
# registry names driver-evaluated, latest status green, evidence debt
# zero (VERDICT r8). PRIORITY now holds ONLY the same-round head
# (VERDICT r8 #1): names born or semantically changed THIS round, so
# they are gate-proven the round they change. Everything else rotates
# automatically, oldest-latest-evidence-first, derived from the
# recorded CORRECTNESS_r*.json history — so the ~190 tail queries
# whose rows date from their birth rounds refresh through the gate a
# few dozen per round instead of never. tools/verify_local.py still
# checks ALL entries every time — including under the driver-identical
# vanilla session (--vanilla).
PRIORITY = [
    # --- round-11: results CHANGED this round (VERDICT r10 #1 — the
    # sqrt-corpus centroid budget is now semantic_dedup's and
    # semantic_dedup_sweep's DEFAULT; oracles carry the computed
    # LIMIT) — same-round PRIORITY re-proof required ---
    "embedding_semantic_dedup", "semantic_dedup_sweep",
    # --- round-11: results unchanged but code touched (auto now
    # routes through the shared sqrt_budget helper; the recall gate
    # pins max_centroids=256 explicitly to keep its matched-quantizer
    # subset invariant; assignment kernel gained ref-axis slicing —
    # bit-identity asserted by test, re-proved out of caution) ---
    "semantic_dedup_auto", "semantic_dedup_snm_recall",
    # --- round-11: the shared assignment kernel gained ref-axis
    # slicing (ADVICE r10, executor-memory bound) — bit-identity is
    # asserted by test and the slicing is a single slice at every
    # default caller, but EVERY registry consumer of nearest_ref_vec
    # (transitive, computed from the call graph — including the two
    # gates that drive it under a STREAMING plan) is re-proved
    # same-round out of caution. brute_force_topk has its own
    # untouched local-topk kernel, so ann_topk_bruteforce rotates
    # normally ---
    "ann_topk_ivf", "ann_topk_ivfpq", "embedding_outliers",
    "semantic_dedup_snm", "semantic_dedup_delta",
    "ivf_incremental_assign", "semantic_decontaminate",
    "decontamination_by_benchmark", "stream_semantic_decon_gate",
    "stream_embedding_outlier_gate", "stream_decontaminate_gate",
    # --- round-11 streaming-review fixes (self-review of
    # streaming/): early-firing partials deduped on stalled
    # watermarks, traced delta-alert default aligned, interval-join
    # semi/anti alias normalization, upsert sink's Hadoop-FS
    # existence probe — all 9 consumers re-verified at 3 SFs locally
    # (hashes unchanged; the dedupe only binds in stalled-wm regimes
    # the replay doesn't produce), re-proved same-round out of
    # caution ---
    "stream_early_firing", "stream_early_firing_multibatch",
    "stream_delta_alerts", "stream_delta_alerts_smallbatch",
    "stream_interval_join", "stream_left_outer_join",
    "stream_full_outer_join", "stream_semi_join", "stream_upsert_state",
    # --- round-11 operator-review fixes with plan-affecting edits
    # (delta's >=-threshold + cold-start bootstrap is already headed
    # above; these five had join/select/guard restructurings — all 12
    # consumers verified 3 SFs locally, hashes unchanged) ---
    "stratified_split_alloc", "events_value_bands", "ann_topk_pq",
    "simhash_near_pairs", "dedup_clusters",
    # --- round-11 sources/plans review fixes (compact_parquet count
    # clamp; write_bucketed qualified-name guard) — verified 3 SFs ---
    "stream_ingest_compact", "bucketed_colocated_join",
]


def _gate_history() -> dict[str, tuple[str, int]]:
    """Per-query (outcome, latest round) across every recorded gate run
    (CORRECTNESS_r*.json, written into the repo by the driver each
    round): 'passed' if the latest check hash-matched (or rows-matched
    for rows-only entries), else 'failed'; the int is the round of
    that latest row. Absent = never evaluated."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    status: dict[str, tuple[str, int]] = {}

    def round_no(p: str) -> int:
        # numeric sort: lexicographic glob order would break
        # latest-wins at r10 vs r2 / r100 vs r11
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
                       key=round_no):
        rno = round_no(path)
        try:
            rep = json.load(open(path))
        except Exception:
            continue
        for name, res in rep.items():
            ok = bool(res.get("hash_match")
                      or (res.get("err") is None and res.get("rows_match")
                          is not False and res.get("spark_rows") is not None))
            status[name] = ("passed" if ok else "failed", rno)
    return status


def _ordered_names() -> list[str]:
    """Gate evaluation order. The budget covers ~50 queries per round:
    manual PRIORITY head first (this round's new/changed names), then
    never-evaluated queries, then previously-failed (re-prove fixes),
    then previously-passed rotated OLDEST-latest-row-first — so stale
    driver evidence refreshes instead of sitting behind a static fill
    forever (VERDICT r8 #1). Registration order breaks ties, keeping
    the rotation deterministic for a fixed history."""
    head = [n for n in PRIORITY if n in REGISTRY]
    seen = set(head)
    hist = _gate_history()
    reg_idx = {n: i for i, n in enumerate(REGISTRY)}

    def key(n: str) -> tuple[int, int, int]:
        st = hist.get(n)
        if st is None:
            return (0, 0, reg_idx[n])          # never evaluated: first
        outcome, rno = st
        return (1 if outcome == "failed" else 2, rno, reg_idx[n])

    tail = sorted((n for n in REGISTRY if n not in seen), key=key)
    return head + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
