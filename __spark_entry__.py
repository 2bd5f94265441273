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
# bounded budget (~50 per round). Rounds 1-5 proved 217 distinct
# queries, 217 green in latest status, 0 failures. Round 6 executes
# VERDICT r5 #1 (ROADMAP "Round-6 FIRST ACTION"): the head is exactly
# the 28 registry names with no driver row in any CORRECTNESS_r*.json
# (the late-round-5 additions that sat past the old ~98-name head),
# followed by fresh rows for the two plan rewrites whose last driver
# rows predate them (VERDICT r5 #4: doc_repetition_stats'
# zero-exchange form, dedup_clusters' edge-touched CC with loop-scoped
# shuffles), then ~20 previously-proven high-value names to fill the
# ~50 budget. 28 + 2 + 20 = 50. After the r6 gate, every one of the
# 245 registry names has a green row in some CORRECTNESS_r*.json.
# The registry is FROZEN at 245 this round (VERDICT r5 #2) until the
# evidence debt is zero. tools/verify_local.py checks ALL entries
# every time — 245/245 pass at sf0.01, including under the
# driver-identical vanilla session (tools/verify_local.py --vanilla).
PRIORITY = [
    # --- the 28 never-driver-evaluated names (registry order) ---
    "winnow_fingerprint_pairs", "dsir_importance_weights",
    "bpe_train_merges", "dsir_resample_topk", "bpe_encode_doc_stats",
    "bpe_apply_token_counts", "substring_dedup_rewrite",
    "doc_trigram_backoff_ppl", "mixture_waterfill_alloc",
    "substring_dedup_incremental", "pipeline_curation_v4",
    "bmp_thumbnail_stats", "grouped_kfold_assign",
    "media_dedup_by_chunks", "orc_roundtrip", "langid_ngram_profiles",
    "stream_curation_gate", "wav_frame_features", "kanon_risk_audit",
    "compaction_bin_packing", "doc_ngram_novelty", "ann_ndcg_mrr",
    "quality_calibration_isotonic", "dp_noised_histogram",
    "rater_agreement_kappa", "embedding_int8_quant", "bmp_dhash_dedup",
    "ann_recall_truncated",
    # --- fresh rows for the two rewritten plans (VERDICT r5 #4) ---
    "doc_repetition_stats", "dedup_clusters",
    # --- previously-proven high-value fill to the ~50 budget ---
    "w_avg_temp", "rolling_max_by", "asof_smoke_alert",
    "q1_pricing_summary", "q5_local_supplier", "dedup_exact",
    "minhash_lsh_pairs", "ann_topk_bruteforce", "quality_score",
    "stream_early_firing_multibatch", "stream_delta_alerts_smallbatch",
    "bmp_decode_stats", "wav_decode_stats", "embedding_top_pc",
    "pipeline_curation_v3", "setsim_jaccard_prefix",
    "ann_topk_lsh_multiprobe", "segment_overlap_hll", "part_skyline",
    "hybrid_retrieval_rrf",
    # --- beyond the ~50 budget; kept for rotation stability ---
    "stream_early_firing", "ann_topk_pq", "ann_topk_ivfpq",
    "doc_compression_ratio", "stream_delta_alerts",
    "events_cusum_drift", "stream_cusum_drift", "ab_test_zscores",
    "stream_ab_guardrail", "vocab_coverage_curve",
    "stream_manifest_maintenance", "stream_distinct_sketch",
    "error_recent_clicks", "events_moving_avg",
    "events_value_stats", "funnel_conversion", "events_json_props",
    "doc_chunks", "corpus_stats_by_source", "shared_passages",
    "events_zscore_anomalies", "user_retention_cohorts", "dedup_keep_best",
    "lang_id_confusion", "scrub_audit_by_source", "doc_length_histogram",
    "media_chunks", "customer_rfm_segments", "dataset_mixture_rates",
    "jsonl_roundtrip", "csv_roundtrip", "mixture_temperature_rates",
    "key_skew_report", "bm25_topk", "bloom_decontaminate",
    "corpus_budget_selection", "zorder_clustered_scan",
    "snapshot_diff_changelog", "corpus_shuffle_shards",
    "substring_dup_stats", "token_cms_counts", "dataset_manifest",
    "pipeline_curation_v2", "events_gap_fill",
    "quality_percentile_by_source", "leakage_free_split",
    "ivf_incremental_assign", "part_cooccurrence_lift",
]


def _gate_history() -> dict[str, str]:
    """Per-query outcome across every recorded gate run
    (CORRECTNESS_r*.json, written into the repo by the driver each
    round): 'passed' if the latest check hash-matched (or rows-matched
    for rows-only entries), else 'failed'. Absent = never evaluated."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    status: dict[str, str] = {}

    def round_no(p: str) -> int:
        # numeric sort: lexicographic glob order would break
        # latest-wins at r10 vs r2 / r100 vs r11
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
                       key=round_no):
        try:
            rep = json.load(open(path))
        except Exception:
            continue
        for name, res in rep.items():
            ok = bool(res.get("hash_match")
                      or (res.get("err") is None and res.get("rows_match")
                          is not False and res.get("spark_rows") is not None))
            status[name] = "passed" if ok else "failed"
    return status


def _ordered_names() -> list[str]:
    """Gate evaluation order. The budget covers ~50 queries per round,
    so: manual PRIORITY head first, then rotation by recorded history —
    never-evaluated queries, then previously-failed (re-prove fixes),
    then previously-passed (cheapest to lose) — each group in
    registration order."""
    head = [n for n in PRIORITY if n in REGISTRY]
    seen = set(head)
    hist = _gate_history()
    rank = {"passed": 2, "failed": 1}
    tail = sorted(
        (n for n in REGISTRY if n not in seen),
        key=lambda n: rank.get(hist.get(n), 0))
    return head + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
