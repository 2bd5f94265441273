"""Registry-wide physical-plan hygiene: the properties SCALE.md claims
must be visible in the actual plans, not just intended."""

from __future__ import annotations

import pytest

from examples_scala_spark.plans.inspect import explain_str
from examples_scala_spark.queries import REGISTRY

RELATIONAL = [n for n, s in REGISTRY.items() if "relational" in s.tags]

# queries whose semantics REQUIRE Python (Arrow-batched by design)
PYTHON_BY_DESIGN = {"media_meta", "frame_sample", "stream_delta_alerts",
                    "stream_early_firing"}


def test_relational_suite_stays_jvm_side(spark, sf_dir):
    """No TPC-H query may regress into a Python UDF — the whole suite
    must run inside whole-stage codegen."""
    offenders = []
    for name in RELATIONAL:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = explain_str(df, "simple")
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"Python UDFs in relational plans: {offenders}"


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """A CartesianProduct node in any registry plan is a scale bug —
    every intentional cross join here is a broadcast of a tiny side
    (scalar subqueries, ANN query sets), which plans as
    BroadcastNestedLoopJoin instead."""
    offenders = []
    for name, spec in REGISTRY.items():
        if "streaming" in spec.tags:
            continue  # building them starts real streams; covered elsewhere
        plan = explain_str(spec.fn(spark, sf_dir), "simple")
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_local_supplier",
                                  "q10_returned_items"])
def test_dimension_joins_broadcast(spark, sf_dir, name):
    plan = explain_str(REGISTRY[name].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan, name


def test_q18_single_lineitem_scan(spark, sf_dir):
    """r6 rewrite guard: q18 reuses the HAVING aggregate as total_qty
    (the group is per-order), so the plan must scan lineitem exactly
    once — a second scan means someone reintroduced the textbook
    re-join + re-aggregation."""
    plan = explain_str(REGISTRY["q18_large_volume_customer"].fn(
        spark, sf_dir), "simple")
    assert plan.count("lineitem.parquet") == 1, plan


@pytest.mark.parametrize("name,frag", [
    ("q1_pricing_summary", "LessThanOrEqual(l_shipdate"),
    ("q6_forecast_revenue", "GreaterThanOrEqual(l_shipdate"),
    ("q19_discounted_revenue", "IsNotNull(l_partkey)"),
])
def test_predicates_reach_scan(spark, sf_dir, name, frag):
    plan = explain_str(REGISTRY[name].fn(spark, sf_dir))
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    assert frag in pushed, f"{name}: {frag} not in {pushed}"


def test_topk_plans_as_take_ordered(spark, sf_dir):
    """orderBy().limit(k) must plan as TakeOrderedAndProject (per-
    partition heaps), never a global Sort followed by Limit."""
    for name in ["q3_shipping_priority", "q10_returned_items",
                 "q18_large_volume_customer"]:
        plan = explain_str(REGISTRY[name].fn(spark, sf_dir), "simple")
        assert "TakeOrderedAndProject" in plan, name


@pytest.mark.parametrize("name,max_exchanges", [
    # one shuffle on user_id serves both window passes and both groupBys
    ("events_session_stats", 1),
    ("events_moving_avg", 1),
    # grouping sets expand inside a single hash aggregate
    ("events_rollup", 1),
    ("events_cube", 1),
    # narrow word stats + two doc_id-keyed aggregations, no join
    ("doc_repetition_stats", 0),    # r5 narrow rewrite: sorted-array
                                    # run-length fold, zero exchanges
    # three chained conditional window minima + final collapse, all on
    # one user_id partitioning
    ("funnel_conversion", 1),
])
def test_shuffle_budget(spark, sf_dir, name, max_exchanges):
    """The shuffle counts SCALE.md claims for the analytic queries must
    hold in the actual physical plans."""
    plan = explain_str(REGISTRY[name].fn(spark, sf_dir), "simple")
    assert plan.count("Exchange") <= max_exchanges, (
        f"{name}: {plan.count('Exchange')} exchanges > {max_exchanges}")


def test_moving_avg_single_window_node(spark, sf_dir):
    """Both frame aggregates (sum, count) over the same spec must share
    ONE Window physical node — a second node would re-sort."""
    plan = explain_str(REGISTRY["events_moving_avg"].fn(spark, sf_dir),
                       "simple")
    assert plan.count("Window") == 1


def test_decontamination_broadcasts_bench_index(spark, sf_dir):
    """The benchmark shingle index must broadcast — a shuffled
    corpus-vs-bench join would be the 100 TB failure mode."""
    plan = explain_str(REGISTRY["decontaminate_overlap"].fn(spark, sf_dir),
                       "simple")
    assert "BroadcastHashJoin" in plan


def test_bigram_topk_take_ordered(spark, sf_dir):
    plan = explain_str(REGISTRY["bigram_cond_prob"].fn(spark, sf_dir),
                       "simple")
    assert "TakeOrderedAndProject" in plan


def _shuffles(plan: str) -> int:
    """Shuffle exchanges only (hash + single-partition), excluding
    BroadcastExchange — broadcasts ship dimension-sized data and are
    the point, not the cost."""
    return (plan.count("Exchange hashpartitioning")
            + plan.count("Exchange SinglePartition"))


@pytest.mark.parametrize("name,max_shuffles", [
    ("doc_chunks", 0),              # chunking is embarrassingly parallel
    ("label_centroids", 1),         # one hash agg on (label, dim)
    ("corpus_stats_by_source", 1),  # one hash agg on (source, lang)
    ("shared_passages", 2),         # count_distinct's two-phase agg
    ("doc_passage_dup_ratio", 4),   # tot + dup + shared's two phases
    ("q20_excess_availability", 2), # (part,supp) agg + distinct cand
    ("q2_min_cost_supplier", 3),    # derived ps + mincost + join-back
    # one user_id shuffle serves lag/run-id windows, the per-run
    # groupBy (user_id prefixes the grouping key), and the lead window
    ("events_scd2_intervals", 1),
    ("doc_sequence_packing", 1),    # one bucket shuffle for the cumsum
    # the corpus never shuffles: only the Arrow-pruned candidate set
    # (<= k * partitions * strata rows) moves for the exact ranking
    ("stratified_reservoir", 1),
    ("quality_model_scores", 0),    # inference is a narrow map
    # prior sigs agg + fresh sigs agg; the changed-id join broadcasts
    ("minhash_incremental", 3),
    # round-3 additions
    ("corpus_shuffle_shards", 1),   # shard window; key is the hash
    ("dataset_manifest", 1),        # map-side combined cell agg
    # hash count + join-back/doc agg + the r9 shuffle_hash pin on the
    # pos x dup_hashes join (was a planner-chosen broadcast that built
    # a 12 GiB HashedRelation at the 100x probe — the extra exchange
    # is the deliberate price of never broadcasting a fact side)
    ("substring_dup_stats", 3),
    ("snapshot_diff_changelog", 2), # windows + join reuse user_id part.
    ("events_gap_fill", 2),         # range agg + grid join (per key)
    ("stratified_split_alloc", 1),  # reservoir prune keeps corpus put
    ("ann_topk_lsh_multiprobe", 1), # probes broadcast; sig equi-join
    ("quality_percentile_by_source", 2),  # score-count agg + dist win
    ("token_cms_counts", 4),        # cell agg + scalar N + exact side
    # distinct pairs + per-order self-join + pair/support aggs; all
    # post-distinct volumes, the raw fact shuffles exactly once
    ("part_cooccurrence_lift", 9),
    ("sliding_distinct_users", 4),  # 2 dedupes + window agg + scalar
    # round-3 batch 2
    ("gopher_quality_flags", 2),    # (doc,word) agg + per-doc agg
    ("events_cusum_drift", 2),      # per-type target agg + key window
    ("events_trend_ols", 2),        # moment agg + scalar min
    ("neardup_triangle_stats", 7),  # LSH pairs + wedge/close + credits
    ("setsim_jaccard_prefix", 12),  # df-rank + prefix join + verify
    ("part_skyline", 6),            # price agg + range/pid-window/
                                    # bounds/prefix shuffles, ALL over
                                    # the tiny per-price aggregate —
                                    # the price of zero
                                    # single-partition windows (r5)
    ("user_lifecycle_states", 7),   # distinct + user windows + day aggs
    ("ab_test_zscores", 1),         # one map-combined moment agg
    ("inverted_index_postings", 2), # (term,doc) tf agg + term agg
    ("mutual_information_bands", 7),  # quartiles + joint agg + windows
    ("doc_containment_pairs", 4),   # shingle distinct + sz + pair agg
    ("doc_bigram_logppl", 7),       # doc-bigram agg + LM agg/window
                                    # + 2 bigram-key exchanges for the
                                    # pinned shuffle_hash scoring join
                                    # (r10: the vocab2-scaling LM must
                                    # never broadcast — two cheap
                                    # exchanges bought the removal of
                                    # a corpus-sized broadcast)
    ("segment_overlap_hll", 3),     # per-user sets + type agg + pairs
                                    # (was 13 before the r5 rewrite)
    ("part_neighbors_cosine", 11),  # basket pairs + union + rank
    ("source_token_entropy", 2),    # (source,word) agg + source agg
    ("events_decayed_counts", 2),   # scalar max + one aggregate
    ("events_psi_drift", 5),        # scalars + cell agg + type window
    ("benford_price_audit", 3),     # digit agg + scalar total
    ("clickstream_top_paths", 2),   # user window + path agg (+ top-k)
    ("source_zipf_slope", 2),       # vocab agg + rank window + OLS agg
    ("order_cohort_ltv", 3),        # cust window + cell agg + cumsum
    ("part_demand_abc_xyz", 3),     # weekly agg + part agg + scan cum
    ("supplier_return_wilson", 1),  # one map-combined aggregate
    ("events_burst_minutes", 3),    # minute agg x2 sides + moments
    ("lineitem_quantity_equidepth", 2),  # percentile scalar + bucket agg
    ("funnel_time_percentiles", 4),  # 2 per-user mins + join + scalar
    ("events_chi2_independence", 8),  # cell agg reused by 3 marginals
    ("vocab_coverage_curve", 5),    # vocab agg + rank window + cutoffs
    ("gopher_rule_overlap", 5),     # gopher aggs + per-doc pair join
    ("events_value_autocorr", 2),   # type window + moment agg
    ("quality_signal_correlation", 8),  # ppl chain + join + moments
                                    # (+2 in r10: inherits the ppl
                                    # chain's de-broadcast LM join)
    ("events_runs_test", 3),        # median agg + type window + moments
])
def test_new_query_shuffle_budget(spark, sf_dir, name, max_shuffles):
    plan = explain_str(REGISTRY[name].fn(spark, sf_dir), "simple")
    assert _shuffles(plan) <= max_shuffles, (
        f"{name}: {_shuffles(plan)} shuffles > {max_shuffles}\n{plan}")


def test_part_skyline_has_no_single_partition_window(spark, sf_dir):
    """The r5 rewrite replaced the global running max with
    range-partitioned scans + a broadcast prefix-max; a
    SinglePartition exchange reappearing means the scalable form
    regressed (VERDICT r4 #5)."""
    plan = explain_str(REGISTRY["part_skyline"].fn(spark, sf_dir), "simple")
    assert "SinglePartition" not in plan


def test_q2_no_forced_broadcast_and_takes_ordered_topk(spark, sf_dir):
    """r12 review fix: the min-cost join-back side is part-cardinality
    (SF-scaled), so it must NOT be force-broadcast — the initial plan
    shows a shuffle join (AQE converts it to broadcast at runtime
    while mc measures small; at 100 TB the shuffle join stands). The
    fixed-cardinality nation/region broadcasts live before the
    localCheckpoint boundary, so no BroadcastHashJoin should appear in
    the visible (post-checkpoint) plan at all. LIMIT 100 must still be
    TakeOrderedAndProject, never a global sort."""
    plan = explain_str(REGISTRY["q2_min_cost_supplier"].fn(spark, sf_dir),
                       "simple")
    assert "BroadcastHashJoin" not in plan    # no forced SF-scaled broadcast
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    assert "TakeOrderedAndProject" in plan    # LIMIT 100 never global-sorts

def test_range_join_plans_as_equi_join(spark, sf_dir):
    """The bucketized range join must plan as a hash/broadcast EQUI
    join on the grid cell — a BroadcastNestedLoopJoin or cartesian
    product here means the non-equi predicate leaked through and the
    plan is |left| x |right| at scale."""
    plan = explain_str(REGISTRY["events_value_bands"].fn(spark, sf_dir),
                       "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_zorder_scan_pushes_both_range_predicates(spark, sf_dir):
    """The point of the z-order rewrite: BOTH range predicates reach
    the parquet scan as pushed filters (file/row-group pruning uses
    them against per-file min/max)."""
    # formatted mode: the simple-mode scan line truncates the filter
    # list mid-way
    plan = explain_str(REGISTRY["zorder_clustered_scan"].fn(spark, sf_dir),
                       "formatted")
    for frag in ("GreaterThanOrEqual(user_id,40)",
                 "LessThanOrEqual(user_id,60)",
                 "GreaterThanOrEqual(value,100.0)",
                 "LessThanOrEqual(value,200.0)"):
        assert frag in plan, frag


@pytest.mark.parametrize("name,max_shuffles", [
    # round-7 additions
    ("w_session_stats", 1),      # one keyed shuffle; session merge is per-key
    ("w_sliding_avg", 1),        # windows expand map-side, one agg shuffle
    ("rerank_cross_encoder", 7),  # retriever's 6 + broadcast-fetch agg
    ("value_quantile_kll", 4),   # sketch partial/merge + rank verification
])
def test_round7_shuffle_budget(spark, sf_dir, name, max_shuffles):
    plan = explain_str(REGISTRY[name].fn(spark, sf_dir), "simple")
    assert _shuffles(plan) <= max_shuffles, (
        f"{name}: {_shuffles(plan)} shuffles > {max_shuffles}\n{plan}")


def test_round7_windows_stay_jvm_side(spark, sf_dir):
    """The session/sliding window queries must plan without any
    Python/Arrow stage — the whole point of using the native
    operators is whole-stage-codegen window assignment."""
    for name in ("w_session_stats", "w_sliding_avg"):
        plan = explain_str(REGISTRY[name].fn(spark, sf_dir), "simple")
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name


def test_rerank_broadcasts_candidates(spark, sf_dir):
    """The rerank stage must fetch candidate texts via a BROADCAST
    hash join against the corpus — a shuffle join here means the
    bounded-candidate design regressed. The embedded retriever
    sub-plan contains broadcast joins of its own (ADVICE r7), so a
    bare substring check would pass even after a regression: compare
    the COUNT of broadcast joins against the retriever-only plan and
    require at least one more — the candidate-fetch join itself."""
    rerank = explain_str(REGISTRY["rerank_cross_encoder"].fn(spark, sf_dir),
                         "simple")
    retriever = explain_str(
        REGISTRY["hybrid_retrieval_rrf"].fn(spark, sf_dir), "simple")
    n_rerank = rerank.count("BroadcastHashJoin")
    n_retr = retriever.count("BroadcastHashJoin")
    assert n_rerank >= n_retr + 1, (
        f"rerank plan has {n_rerank} broadcast joins vs retriever's "
        f"{n_retr}; the candidate-fetch join is no longer broadcast\n"
        f"{rerank}")


@pytest.mark.parametrize("name,max_shuffles", [
    # round-8 additions
    ("pii_redaction_stats", 0),  # narrow regexp projection, scan-bound
    ("w_sliding_topk", 2),       # partial-agg shuffle + per-window rank
    ("ann_topk_hamming", 1),     # broadcast queries + per-query rank
    ("ann_hamming_recall", 6),   # two rank passes + hit join/agg
    ("dup_ngram_char_fraction", 5),  # all doc_id-keyed: gram window,
                                     # coverage distinct, char join, totals
])
def test_round8_shuffle_budget(spark, sf_dir, name, max_shuffles):
    plan = explain_str(REGISTRY[name].fn(spark, sf_dir), "simple")
    assert _shuffles(plan) <= max_shuffles, (
        f"{name}: {_shuffles(plan)} shuffles > {max_shuffles}\n{plan}")


def test_pii_redaction_stays_jvm_side(spark, sf_dir):
    """The PII scrub must plan as pure codegen'd regexp — a Python
    stage here would turn a scan-bound pass into an Arrow round-trip
    at 100 TB."""
    plan = explain_str(REGISTRY["pii_redaction_stats"].fn(spark, sf_dir),
                       "simple")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# --- r13: suite-wide forced-broadcast audit (VERDICT r12 #4) ----------
#
# Every `F.broadcast(x)` in the package is a FORCED hint honored
# regardless of runtime size — safe only for sides bounded by contract
# (1-row scalar aggregates, fixed-cardinality dims, capped query/bench
# sets, changelog deltas). The r12 sweep de-hinted 14 SF-scaled sides;
# r13 de-hinted the winnow hot-fingerprint set, the passage-dup shared
# hashes and the curation contamination set. This test freezes the
# audit: a NEW broadcast site fails until its bounded-size argument is
# reviewed and added below.
AUDITED_BROADCASTS = {
    # file (relative to the package) -> audited argument identifiers
    "operators/bloom.py": {"bench_sh"},        # benchmark shingles (bench-sized by contract)
    "operators/cdc.py": {"changed_keys"},      # CDC batch changelog
    "operators/dedup.py": {"bench",            # benchmark set (contract)
                           "changed_ids"},     # incremental changelog
    "operators/graph.py": {"dangling"},        # 1-row dangling-mass scalar
    "operators/joins.py": {"dim", "r2", "rules_now", "sw"},  # dimension tables (contract)
    "operators/sampling.py": {"kdf",           # per-stratum quotas (catalog-sized)
                              "lp",            # 512-bucket DSIR model
                              "n_r", "n_t",    # 1-row totals
                              "tgt"},          # 512-bucket targets
    "operators/similarity.py": {"bench", "bench.select(",  # benchmark ids (contract)
                                "candidates",  # top-k candidate ids (k-bounded)
                                "cents",       # centroid set (sqrt-corpus budget)
                                "changed_ids",  # incremental changelog
                                "probes",      # nprobe cells per query
                                "queries", "queries.select("},  # query set (contract)
    "operators/sketches.py": {"n_total"},      # 1-row scalar
    "operators/text.py": {"dfreq",             # vocab doc-freq (vocab-sized)
                          "lang_prof", "langs",  # per-language profiles
                          "n_docs", "total", "st", "stats"},  # 1-row scalars
    "queries.py": {
        # 1-row (or k-row, k literal) scalar aggregates used via
        # crossJoin(broadcast(...)) or joined on a literal key
        "a", "b", "at_k", "avg_bal", "est", "h_min", "k", "mad",
        "max_rev", "med", "mn", "mr", "mx", "my", "n", "nv", "p",
        "qs", "qv", "rk", "rolled", "snk", "st", "stats", "t", "tgt",
        "tot", "total", "grp2", "pre", "bounds", "bounds.select(",
        # fixed-cardinality dimensions (nation=25, region=5,
        # event_type<=10, source<=small catalog)
        "n1", "n2", "nat", "nation", "reg", "region", "long", "dist",
        # capped-by-contract sets
        "bench", "bench.select(", "bench_ids",  # benchmark set
        "sw",                                   # stopword list literal
    },
}


def test_no_unaudited_forced_broadcast():
    import os
    import re
    root = os.path.join(os.path.dirname(__file__), "..",
                        "examples_scala_spark")
    offenders = []
    for dirpath, _, filenames in os.walk(root):
        if "__pycache__" in dirpath:
            continue
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)
            allowed = AUDITED_BROADCASTS.get(rel, set())
            with open(path) as f:
                src = f.read()
            for m in re.finditer(
                    r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_.]*)(\()?",
                    src):
                name = m.group(1) + (m.group(2) or "")
                base = m.group(1)
                if name in allowed or base in allowed:
                    continue
                line = src[:m.start()].count("\n") + 1
                offenders.append(f"{rel}:{line}: F.broadcast({name}...)")
    assert not offenders, (
        "unaudited forced broadcast(s) — review that the side is "
        "bounded by contract (never corpus-derived) and add to "
        f"AUDITED_BROADCASTS:\n" + "\n".join(offenders))


def test_winnow_no_forced_hot_broadcast(spark, sf_dir):
    """r13 de-hint (VERDICT r12 #3): the winnow hot-fingerprint set is
    corpus-derived (boilerplate grows with the corpus), so the
    left-anti guard join must not be FORCE-broadcast. The planner may
    still auto-broadcast it from size estimates at bench SF (that is
    the point of the de-hint — the decision becomes size-driven), so
    the assertion disables auto-broadcast and checks no broadcast
    remains: a forced F.broadcast hint would survive the thresholds."""
    saved = {c: spark.conf.get(c, None) for c in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                       "-1")
        plan = explain_str(
            REGISTRY["winnow_fingerprint_pairs"].fn(spark, sf_dir),
            "simple")
    finally:
        for c, v in saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)
    assert "BroadcastHashJoin" not in plan
