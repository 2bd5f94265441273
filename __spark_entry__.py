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
# bounded budget (~50 per round). Rounds 1-4 proved 170 distinct
# queries, 170 green in latest status, 0 failures. Round 5 finishes
# the burn-down (VERDICT r4 #1): the head is exactly the 41 queries
# never driver-evaluated in r1-r4 (the round-3 analytics tail, in the
# order the r4 rotation established), followed by this round's
# additions and re-proves — the multi-batch early-firing replay
# (VERDICT r4 #2), the 64-record-Arrow-chunk stateful re-prove
# (VERDICT r4 #4), the real BMP-pixel and WAV-PCM decode queries
# (VERDICT r4 #8 + its audio counterpart), and re-proves of the two
# rewritten plans (part_skyline's departitioned running max,
# segment_overlap_hll's 3-shuffle form — both already in the 41) plus
# embedding_top_pc (adaptive-convergence operator change). 41 + 5 fits
# the ~50 budget, so after r5 every registry name has a green row in
# some CORRECTNESS_r*.json. The auto-rotation still front-loads
# anything the budget misses next round (_ordered_names ranks
# no-history first). The late-round-5 additions (bmp_thumbnail_stats,
# wav_frame_features, media_dedup_by_chunks, grouped_kfold_assign,
# winnow_fingerprint_pairs, and the continuation-session family:
# substring_dedup_rewrite, bpe_train_merges / bpe_apply_token_counts /
# bpe_encode_doc_stats, dsir_importance_weights / dsir_resample_topk,
# pipeline_curation_v4, orc_roundtrip, stream_curation_gate,
# langid_ngram_profiles, substring_dedup_incremental,
# doc_trigram_backoff_ppl, mixture_waterfill_alloc — 18 names)
# deliberately sit OUTSIDE the
# head; they exceed what the r6 auto-rotation can reach past this
# ~98-name head, so round 6's FIRST action is to rewrite PRIORITY
# with them in front (ROADMAP.md "Round-6 FIRST ACTION").
# tools/verify_local.py checks ALL entries every time; 235/235 pass
# at sf0.01 — including under the driver-identical vanilla session
# (tools/verify_local.py --vanilla).
PRIORITY = [
    "ann_topk_lsh_multiprobe", "stratified_split_alloc",
    "sliding_distinct_users", "purchase_touch_attribution",
    "events_mad_anomalies", "revenue_pareto_abc", "event_type_transitions",
    "minhash_accuracy", "lsh_precision_recall", "gopher_quality_flags",
    "events_trend_ols", "neardup_triangle_stats", "setsim_jaccard_prefix",
    "part_skyline", "user_lifecycle_states", "inverted_index_postings",
    "mutual_information_bands", "doc_containment_pairs",
    "doc_bigram_logppl", "segment_overlap_hll", "part_neighbors_cosine",
    "source_token_entropy", "events_decayed_counts", "events_psi_drift",
    "benford_price_audit", "clickstream_top_paths", "source_zipf_slope",
    "order_cohort_ltv", "part_demand_abc_xyz", "pipeline_curation_v3",
    "supplier_return_wilson", "events_burst_minutes",
    "lineitem_quantity_equidepth", "funnel_time_percentiles",
    "lsh_band_sweep", "events_chi2_independence", "gopher_rule_overlap",
    "quality_signal_correlation", "events_value_autocorr",
    "user_activity_gini", "events_runs_test",
    # --- round-5 additions and re-proves ---
    "stream_early_firing_multibatch", "stream_delta_alerts_smallbatch",
    "bmp_decode_stats", "wav_decode_stats", "embedding_top_pc",
    # decode_media now routes real BMP/WAV payloads — re-prove the
    # two queries that share its code path
    "media_meta", "frame_sample",
    # the sample-bound LSH tuning diagnostic and the RRF hybrid
    # retrieval composition (new r5) — head is exactly the ~50 budget
    "lsh_tuning_sampled", "hybrid_retrieval_rrf",
    # --- previously-proven high-value head (beyond the ~50 budget;
    # kept for rotation stability) ---
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
