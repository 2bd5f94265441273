"""Registry-level checks: every query runs at sf0.001 and a sampled
subset hash-matches its DuckDB oracle (the full gate runs in
tools/verify_local.py / the driver)."""

from __future__ import annotations

import duckdb
import pytest

from examples_scala_spark.queries import REGISTRY

import sys
sys.path.insert(0, "/root/repo/tools")
from verify_local import TABLES, value_hash  # noqa: E402

# fast, structurally diverse sample for the pytest loop; the driver
# and verify_local cover all of them
SAMPLE = [
    "w_avg_temp", "rolling_max_by", "alert_temp_delta", "asof_smoke_alert",
    "late_window_updates", "q1_pricing_summary", "q5_local_supplier",
    "dedup_exact", "minhash_lsh_pairs", "ann_topk_bruteforce",
    "quality_score", "media_meta",
    # round-2 representatives
    "doc_sequence_packing", "weighted_reservoir_sample",
    "quality_model_scores", "data_quality_checks", "user_hll_rollup",
    # round-3 representatives
    "bm25_topk", "bloom_decontaminate", "corpus_budget_selection",
    "zorder_clustered_scan",
    # round-4: the five upgraded-oracle entries (exact ADC twins,
    # closed-form early-firing replay, envelope bounds)
    "ann_topk_pq", "ann_topk_ivfpq", "stream_early_firing",
    "doc_compression_ratio", "embedding_top_pc",
    # round-5 continuation representatives: the ExactSubstr rewrite
    # (fold-vs-charwise oracle), the BPE trainer (iterative argmax),
    # and DSIR (nano-unit LLR sums)
    "substring_dedup_rewrite", "bpe_train_merges",
    "dsir_importance_weights",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


# declared rows-only (non-SQL-expressible / algorithm-specific) queries
# — round 4 closed the last five: ann_topk_pq / ann_topk_ivfpq got
# exact DuckDB twins of the deterministic ADC pipeline,
# stream_early_firing's fire set has a closed form under the
# single-batch availableNow replay, and doc_compression_ratio /
# embedding_top_pc emit checkable envelopes (zlib compressBound;
# unit-norm + eigen-residual). Every registry entry now has an oracle.
ROWS_ONLY: set[str] = set()


def test_all_queries_have_oracles():
    missing = [n for n, s in REGISTRY.items() if s.oracle is None]
    assert set(missing) == ROWS_ONLY


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    odf = duck.sql(spec.oracle).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf)


def test_entry_smoke(spark):
    import __spark_entry__ as e
    rows = e.entry(spark).limit(5).collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_gate_ordering_invariants():
    """__spark_entry__ ordering: PRIORITY names must exist, the full
    ordering must cover the registry exactly once, and never-checked
    queries must precede previously-passed ones in the tail."""
    import __spark_entry__ as e

    # PRIORITY may exceed the ~50-query budget (the overflow is
    # auto-rotated next round) but must stay duplicate-free and valid
    assert len(e.PRIORITY) == len(set(e.PRIORITY))
    assert all(n in REGISTRY for n in e.PRIORITY)
    names = list(e.queries())
    assert sorted(names) == sorted(REGISTRY)
    assert names[:len(e.PRIORITY)] == e.PRIORITY
    # round 5: every never-driver-evaluated query (per the recorded
    # CORRECTNESS history) sits inside the ~50 budget OR is one of
    # the five late-round-5 additions deliberately left to the r6
    # rotation — which must front them immediately after the head
    hist0 = e._gate_history()
    deferred = {"bmp_thumbnail_stats", "wav_frame_features",
                "media_dedup_by_chunks", "grouped_kfold_assign",
                "winnow_fingerprint_pairs", "substring_dedup_rewrite",
                "bpe_train_merges", "dsir_importance_weights",
                "bpe_apply_token_counts", "dsir_resample_topk",
                "pipeline_curation_v4", "bpe_encode_doc_stats",
                "orc_roundtrip", "stream_curation_gate",
                "langid_ngram_profiles", "substring_dedup_incremental",
                "doc_trigram_backoff_ppl", "mixture_waterfill_alloc",
                "kanon_risk_audit", "compaction_bin_packing",
                "doc_ngram_novelty", "ann_ndcg_mrr",
                "quality_calibration_isotonic", "dp_noised_histogram",
                "rater_agreement_kappa", "embedding_int8_quant",
                "bmp_dhash_dedup", "ann_recall_truncated"}
    never = [n for n in REGISTRY if n not in hist0]
    for n in never:
        if n in deferred:
            assert names.index(n) < len(e.PRIORITY) + len(deferred), (
                f"deferred {n} not fronted by the rotation")
        else:
            assert names.index(n) < 50, f"never-evaluated {n} outside budget"
    for canary in ("stream_early_firing_multibatch",
                   "stream_delta_alerts_smallbatch", "bmp_decode_stats",
                   "wav_decode_stats", "lsh_tuning_sampled",
                   "hybrid_retrieval_rrf", "embedding_top_pc",
                   "part_skyline", "segment_overlap_hll"):
        assert names.index(canary) < 50
    hist = e._gate_history()
    tail = names[len(e.PRIORITY):]
    seen_passed = False
    for n in tail:
        if hist.get(n) == "passed":
            seen_passed = True
        elif hist.get(n) is None:
            assert not seen_passed, f"never-checked {n} after passed entries"
