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
    # --- round-12: code touched this round (ADVICE fixes: early-firing
    # legacy-checkpoint decode extracted to _decode_ef_state;
    # connected_components max_iterations entry guard). Result hashes
    # unchanged — all 7 call-graph consumers verified at 3 SFs locally
    # — re-proved same-round in the gate out of caution ---
    "stream_early_firing", "stream_early_firing_multibatch",
    "dedup_clusters", "dedup_canonical", "leakage_free_split",
    "pipeline_curation_v3", "doc_pagerank",
    # frame_sample gained a zero-frame guard filter (hash-stable at
    # 3 SFs — no zero-frame rows exist in the decode paths)
    "frame_sample",
    # the avg-rounding family moved to engine-exact integer half-up
    # (_avg6): the full sf0.1 sweep caught stream_sliding_avg on a
    # round-half tie (65.3103125) where Spark's round and DuckDB's
    # disagree; all six rounded-average queries now compute the tie
    # in integer cents on both engines. Re-proven at 3 SFs.
    "stream_sliding_avg", "stream_windowed_avg", "stream_session_stats",
    "stream_session_dynamic_gap", "w_session_dynamic_gap",
    "events_gap_fill",
    # --- round-12 queries.py review: forced F.broadcast hints removed
    # from every SF-scaled side (customer/supplier/part and part-keyed
    # aggregates) — a hard hint is honored regardless of size and
    # would OOM at 100 TB; the planner still broadcasts these at test
    # SF and AQE converts at runtime. Hashes re-proven at 3 SFs
    # locally; re-proved same-round in the gate ---
    "q2_min_cost_supplier", "q3_shipping_priority", "q5_local_supplier",
    "q10_returned_items", "q11_important_stock",
    "q20_excess_availability", "q21_waiting_supplier",
    "stream_static_enrich", "part_cooccurrence_lift",
    "part_neighbors_cosine", "data_quality_checks",
    # --- round-12: retire the r3 evidence generation (VERDICT r11 #2):
    # the 17 remaining names whose latest driver row is r2/r3
    # (doc_pagerank and q20_excess_availability, the other two of the
    # 19, are already headed above as touched consumers). After this
    # round no name's latest evidence predates r4 ---
    "cdc_snapshot_merge", "doc_passage_dup_ratio",
    "doc_sequence_packing", "events_multires_rollup",
    "events_scd2_enrich", "events_scd2_intervals",
    "flatmap_split_udtf", "minhash_incremental", "partition_backfill",
    "stratified_reservoir",
    "stream_incremental_state", "stream_rolling_max_state",
    "stream_trending_tokens", "token_heavy_hitters", "user_hll_rollup",
    "value_quantile_sketch", "weighted_reservoir_sample",
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
