"""Round-9 continuation operators: SoftDeDup reweighting, the
cross-source near-dup leakage matrix (and the other late-round
additions as they land)."""

from __future__ import annotations

from pyspark.sql import functions as F

from examples_scala_spark.operators import dedup
from examples_scala_spark.operators.text import softdedup_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _source_overlap(docs):
    # the registered plan, parameterized on the source frame
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3,
                                    threshold=0.5)
    lab = docs.select("doc_id", "source")
    e = (pairs
         .join(lab.select(F.col("doc_id").alias("doc_a"),
                          F.col("source").alias("source_a")), "doc_a")
         .join(lab.select(F.col("doc_id").alias("doc_b"),
                          F.col("source").alias("source_b")), "doc_b"))
    return (e.select(F.least("source_a", "source_b").alias("src_a"),
                     F.greatest("source_a", "source_b").alias("src_b"),
                     "sig_sim")
            .groupBy("src_a", "src_b")
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.round(F.sum("sig_sim") / F.count("*"), 6)
                 .alias("avg_sig_sim"),
                 F.max("sig_sim").alias("max_sig_sim")))


class TestSemanticDedupSnm:
    def _emb(self, spark, n=60, dim=8):
        # deterministic synthetic embeddings with planted duplicates:
        # ids 3k and 3k+1 share a vector (near-dup pairs), 3k+2 unique
        import math
        rows = []
        for i in range(n):
            base = i - (i % 3 == 1)  # 3k+1 copies 3k's vector
            v = [math.sin(0.7 * (base + 1) * (j + 1)) + 0.1
                 + 0.01 * (i % 3 == 2) * j
                 for j in range(dim)]
            rows.append((i, v))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_big_chunk_equals_plain_semantic_dedup(self, spark):
        from examples_scala_spark.operators.similarity import (
            semantic_dedup, semantic_dedup_snm)

        emb = self._emb(spark)
        plain = {r.vec_id: (r.cell, r.keep_id, r.kept)
                 for r in semantic_dedup(emb, threshold=0.9,
                                         centroid_mod=7).collect()}
        snm = {r.vec_id: (r.cell, r.keep_id, r.kept)
               for r in semantic_dedup_snm(emb, threshold=0.9, chunk=1000,
                                           centroid_mod=7).collect()}
        # a chunk wider than any cell covers every within-cell pair,
        # so the sorted-neighborhood result degrades to exactly the
        # plain quadratic one
        assert snm == plain

    def test_planted_duplicates_collapse(self, spark):
        from examples_scala_spark.operators.similarity import (
            semantic_dedup_snm)

        emb = self._emb(spark)
        out = {r.vec_id: r for r in
               semantic_dedup_snm(emb, threshold=0.999999, chunk=4,
                                  centroid_mod=7).collect()}
        assert len(out) == 60
        for k in range(0, 60, 3):
            if k + 1 not in out:
                continue
            # identical vectors have identical ccos -> adjacent ranks
            # -> same or adjacent chunk: the pair is always compared
            assert out[k + 1].keep_id == k
            assert not out[k + 1].kept
            assert out[k].kept

    def test_snm_drops_subset_of_plain(self, spark):
        # SNM's comparison set is a subset of the plain within-cell
        # pairs, so it can only MISS neighbors: every vector SNM
        # drops, plain drops too (the recall gate's denominator
        # logic relies on exactly this)
        from examples_scala_spark.operators.similarity import (
            semantic_dedup, semantic_dedup_snm)

        emb = self._emb(spark)
        plain = {r.vec_id: r.kept
                 for r in semantic_dedup(emb, threshold=0.9,
                                         centroid_mod=7).collect()}
        snm = {r.vec_id: r.kept
               for r in semantic_dedup_snm(emb, threshold=0.9, chunk=2,
                                           centroid_mod=7).collect()}
        for vid, kept_s in snm.items():
            if not kept_s:
                assert not plain[vid]

    def test_engineered_rank_distant_pair_is_missed(self, spark):
        # The trade SNM makes, demonstrated ON PURPOSE so the recall
        # gate is provably non-vacuous: a1/a2 are near-dups
        # (cos = cos10 ~ .985) but sit far apart in the
        # cosine-to-centroid rank order because nine fillers (same
        # plane angle band, orthogonal off-axis directions) rank
        # between them. With chunk=1 the pair is never compared:
        # plain drops a2, SNM keeps it — exactly the drop_recall < 1
        # case the registered gate reports.
        import math
        dim = 16
        c = [1.0] + [0.0] * (dim - 1)

        def vec(theta_deg, off_axis):
            t = math.radians(theta_deg)
            v = [0.0] * dim
            v[0] = math.cos(t)
            v[off_axis] = math.sin(t)
            return v

        rows = [(1, c)]               # 1 % 7 == 1 -> the only centroid
        rows.append((2, vec(40, 1)))  # a1
        rows.append((30, vec(50, 1)))  # a2: near-dup of a1, lower ccos
        for i, theta in enumerate(range(41, 50)):      # 9 fillers
            rows.append((3 + i, vec(theta, 2 + i)))    # ids 3..11
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

        from examples_scala_spark.operators.similarity import (
            semantic_dedup, semantic_dedup_snm)

        plain = {r.vec_id: r.kept
                 for r in semantic_dedup(emb, threshold=0.9,
                                         centroid_mod=7).collect()}
        snm = {r.vec_id: r.kept
               for r in semantic_dedup_snm(emb, threshold=0.9, chunk=1,
                                           centroid_mod=7).collect()}
        assert not plain[30]   # plain finds the a1 neighbor
        assert snm[30]         # SNM's 1-chunk neighborhood misses it
        # and the wide-chunk run recovers it (the knob is the lever)
        wide = {r.vec_id: r.kept
                for r in semantic_dedup_snm(emb, threshold=0.9, chunk=64,
                                            centroid_mod=7).collect()}
        assert not wide[30]

    def test_keeper_election_invariants(self, spark):
        from examples_scala_spark.operators.similarity import (
            semantic_dedup_snm)

        rows = semantic_dedup_snm(self._emb(spark), threshold=0.9,
                                  chunk=4, centroid_mod=7).collect()
        for r in rows:
            assert r.keep_id <= r.vec_id
            assert r.kept == (r.keep_id == r.vec_id)


class TestStreamDecontaminateGate:
    def test_gate_emits_only_flagged_corpus_docs(self, spark, sf_dir):
        from examples_scala_spark.queries import REGISTRY

        rows = REGISTRY["stream_decontaminate_gate"].fn(
            spark, sf_dir).collect()
        assert rows  # the synthetic corpus has near-dups of bench docs
        for r in rows:
            assert r.doc_id % 89 != 0          # bench side never emitted
            assert 0 < r.n_overlap <= r.n_buckets
            assert r.n_overlap / r.n_buckets >= 0.25
            assert abs(r.overlap_frac
                       - round(r.n_overlap / r.n_buckets, 6)) < 1e-9


class TestPipelineWeightedMixture:
    def test_shares_sum_to_one_and_units_exact(self, spark, sf_dir):
        from examples_scala_spark.queries import REGISTRY

        rows = REGISTRY["pipeline_weighted_mixture"].fn(
            spark, sf_dir).collect()
        assert rows
        total = sum(r.eff_share for r in rows)
        assert abs(total - 1.0) < 1e-4  # 6-dp rounding slack
        for r in rows:
            assert 0 <= r.n_kept <= r.n_docs
            # eff mass cannot exceed docs * max(softdedup) * rate:
            # loose sanity bound, the oracle pins exact values
            assert r.eff_weight >= 0.0


class TestSemanticDecontaminate:
    def test_planted_paraphrase_flagged(self, spark):
        from examples_scala_spark.operators.similarity import (
            semantic_decontaminate)

        # id 3 is benchmark (3 % 97 == 3); id 10 copies its vector
        # scaled by 2 (cosine exactly 1.0 — paraphrase stand-in);
        # id 20 is orthogonal-ish and must not be flagged
        emb = spark.createDataFrame(
            [(3, [1.0, 2.0, 3.0, 4.0]),
             (10, [2.0, 4.0, 6.0, 8.0]),
             (20, [4.0, -3.0, 2.0, -1.0])],
            "vec_id long, embedding array<double>")
        rows = {r.vec_id: r for r in
                semantic_decontaminate(emb, threshold=0.9).collect()}
        assert set(rows) == {10}
        assert rows[10].bench_id == 3
        assert rows[10].cosine == 1.0

    def test_benchmark_rows_never_self_flag(self, spark):
        from examples_scala_spark.operators.similarity import (
            semantic_decontaminate)

        # two benchmark ids (3, 100: 100 % 97 == 3) with identical
        # vectors: they match each other, but benchmark rows are not
        # corpus rows, so nothing is emitted
        emb = spark.createDataFrame(
            [(3, [1.0, 0.0, 0.0, 0.0]),
             (100, [1.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>")
        assert semantic_decontaminate(emb, threshold=0.5).count() == 0

    def test_best_match_tie_breaks_by_bench_id(self, spark):
        from examples_scala_spark.operators.similarity import (
            semantic_decontaminate)

        # both benchmarks equal-cosine to the corpus vector -> the
        # lower bench id wins deterministically
        emb = spark.createDataFrame(
            [(3, [1.0, 1.0, 0.0, 0.0]),
             (100, [1.0, 1.0, 0.0, 0.0]),
             (7, [2.0, 2.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>")
        [row] = semantic_decontaminate(emb, threshold=0.9).collect()
        assert (row.vec_id, row.bench_id, row.cosine) == (7, 3, 1.0)


class TestEmbeddingOutliers:
    def _cell(self, spark, spread, with_corrupt):
        # one centroid (1 % 7 == 1) plus 20 members: `spread` puts
        # them 5 degrees off-axis in distinct dims; otherwise they
        # are colinear scaled copies (cosine exactly 1 for all)
        import math
        dim = 24
        rows = [(1, [1.0] + [0.0] * (dim - 1))]
        t = math.radians(5)
        for i in range(20):
            v = [0.0] * dim
            if spread:
                v[0] = math.cos(t)
                v[2 + i] = math.sin(t)
            else:
                v[0] = 2.0 + i
            rows.append((7 * i + 2, v))     # 7i+2 % 7 == 2: members
        if with_corrupt:
            v = [0.0] * dim
            v[0], v[1] = 0.2, 0.9           # ccos ~ 0.22: corrupt
            rows.append((699, v))           # 699 % 7 == 6
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    def test_planted_corrupt_vector_flagged(self, spark):
        from examples_scala_spark.operators.similarity import (
            embedding_outliers)

        out = embedding_outliers(self._cell(spark, True, True), z=3,
                                 min_cell=8, centroid_mod=7).collect()
        assert [r.vec_id for r in out] == [699]
        assert out[0].cell_n == 22

    def test_zero_variance_cell_flags_nothing(self, spark):
        from examples_scala_spark.operators.similarity import (
            embedding_outliers)

        # every member colinear with the centroid -> every
        # milli-cosine is exactly 1000 -> integer variance exactly 0
        # -> the strict inequality can never fire (0 > 0); a float
        # implementation could flag on rounding dust here
        out = embedding_outliers(self._cell(spark, False, False), z=3,
                                 min_cell=8, centroid_mod=7).collect()
        assert out == []

    def test_small_cells_exempt(self, spark):
        from examples_scala_spark.operators.similarity import (
            embedding_outliers)

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0]),
             (2, [0.9, 0.1, 0.0, 0.0]),
             (3, [0.1, 0.9, 0.2, 0.0])],
            "vec_id long, embedding array<double>")
        out = embedding_outliers(emb, z=3, min_cell=8,
                                 centroid_mod=7).collect()
        assert out == []  # 3-member cell: no meaningful variance


class TestBpeFertilityByLang:
    def test_rollup_matches_per_doc_stats(self, spark):
        from examples_scala_spark.operators import text

        docs = spark.createDataFrame(
            [(1, "lower lowest newer newest wider widest", "en"),
             (2, "lower newer wider low new wide", "en"),
             (3, "ein zwei drei vier ein zwei", "de"),
             (4, "", "de")],  # zero extractable words
            "doc_id long, text string, lang string")
        per = {r.doc_id: r
               for r in text.bpe_encode_doc_stats(docs, k_merges=4)
               .collect()}
        rolled = (text.bpe_encode_doc_stats(docs, k_merges=4)
                  .join(docs.select("doc_id", "lang"), "doc_id")
                  .groupBy("lang")
                  .agg(F.count("*").alias("n_docs"),
                       F.sum("n_words").alias("n_words"),
                       F.sum("n_subwords").alias("n_subwords")))
        by = {r.lang: r for r in rolled.collect()}
        assert by["en"].n_docs == 2
        assert by["de"].n_docs == 2
        assert by["en"].n_words == per[1].n_words + per[2].n_words
        assert by["en"].n_subwords == (per[1].n_subwords
                                       + per[2].n_subwords)
        # every word segments into >= 1 subword
        assert by["en"].n_subwords >= by["en"].n_words
        assert by["de"].n_words == per[3].n_words  # empty doc adds 0


class TestDedupSourceOverlap:
    def test_cross_and_diagonal_cells(self, spark):
        t = "the quick brown fox jumps over the lazy dog again today"
        docs = spark.createDataFrame(
            [(1, t, "srcB"), (2, t, "srcA"),        # cross-source dup
             (3, t, "srcA"),                        # srcA self-dup too
             (4, "completely different words with no overlap at all "
                 "whatsoever in any shingle", "srcC")],
            "doc_id long, text string, source string")
        rows = {(r.src_a, r.src_b): r
                for r in _source_overlap(docs).collect()}
        # identical texts -> identical signatures -> sig_sim = 1.0
        assert rows[("srcA", "srcB")].n_pairs == 2  # (1,2) and (1,3)
        assert rows[("srcA", "srcB")].avg_sig_sim == 1.0
        assert rows[("srcA", "srcA")].n_pairs == 1  # (2,3) diagonal
        assert rows[("srcA", "srcA")].max_sig_sim == 1.0
        # the unique source appears in no cell
        assert not any("srcC" in k for k in rows)

    def test_pair_key_is_order_normalized(self, spark):
        t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = spark.createDataFrame(
            [(1, t, "zz_late"), (2, t, "aa_early")],
            "doc_id long, text string, source string")
        [row] = _source_overlap(docs).collect()
        assert (row.src_a, row.src_b) == ("aa_early", "zz_late")


class TestSoftDedupWeights:
    def test_endpoints_and_ordering(self, spark):
        # doc 1+2 share every 4-gram (identical text -> most common);
        # doc 3 is unique content (rarest); doc 4 too short for any
        # 4-gram. Min-max normalization pins the endpoints exactly:
        # most common -> 0.5, rarest -> 1.0, gram-less -> 1.0.
        common = "alpha beta gamma delta alpha beta gamma delta"
        out = {r.doc_id: r for r in softdedup_weights(_docs(spark, [
            (1, common),
            (2, common),
            (3, "unique words never repeated anywhere else here"),
            (4, "too short"),
        ])).collect()}
        assert out[4].n_grams == 0
        assert out[4].softdedup_weight == 1.0
        assert out[4].mean_logp is None
        assert out[1].softdedup_weight == 0.5
        assert out[2].softdedup_weight == 0.5
        assert out[3].softdedup_weight == 1.0
        # commonness ordering: duplicated docs sit above unique ones
        assert out[1].mean_logp > out[3].mean_logp

    def test_degenerate_uniform_corpus_keeps_full_weight(self, spark):
        # every doc identical -> max == min -> no spread to normalize
        # over; everything keeps weight 1.0 rather than dividing by 0
        t = "one two three four five six"
        rows = softdedup_weights(
            _docs(spark, [(i, t) for i in range(3)])).collect()
        assert all(r.softdedup_weight == 1.0 for r in rows)
        assert len({r.mean_logp for r in rows}) == 1

    def test_null_text_defined(self, spark):
        # NULL coalesces to '' at entry: no grams, full weight
        out = softdedup_weights(
            _docs(spark, [(1, None),
                          (2, "a b c d e f g h"),
                          (3, "a b c d e f g h z z z z")])).collect()
        by = {r.doc_id: r for r in out}
        assert by[1].n_grams == 0
        assert by[1].softdedup_weight == 1.0

    def test_more_duplication_never_raises_weight(self, spark):
        # THE SoftDeDup semantic: adding more copies of a document's
        # content makes its grams more common, so its weight must not
        # increase (it stays the corpus max only if it remains the
        # rarest). Compare doc 1's weight in a corpus with 1 copy of
        # its text vs 4 copies.
        t = "alpha beta gamma delta epsilon zeta eta theta"
        other = [(90, "one two three four five six seven eight"),
                 (91, "nine ten eleven twelve thirteen fourteen "
                      "fifteen sixteen")]
        w1 = {r.doc_id: r.softdedup_weight for r in softdedup_weights(
            _docs(spark, [(1, t)] + other)).collect()}
        w4 = {r.doc_id: r.softdedup_weight for r in softdedup_weights(
            _docs(spark, [(1, t), (2, t), (3, t), (4, t)] + other))
            .collect()}
        assert w4[1] <= w1[1]
        # and in the 4-copy corpus the duplicated family sits at the
        # floor while the unique docs keep full weight
        assert w4[1] == 0.5
        assert w4[90] > w4[1]

    def test_partition_invariance(self, spark):
        # nano-unit integer accumulation + broadcast scalars: the
        # result is a pure function of the data, not of partitioning
        rows = [(i, f"w{i % 7} x{i % 5} y{i % 3} z{i % 2} "
                    f"a{i % 11} b{i % 13} c d e f")
                for i in range(40)]
        base = softdedup_weights(_docs(spark, rows)).collect()
        again = softdedup_weights(
            _docs(spark, rows).repartition(17)).collect()
        assert sorted(map(tuple, base)) == sorted(map(tuple, again))

    def test_every_doc_appears_weight_bounded(self, spark):
        rows = softdedup_weights(_docs(spark, [
            (1, "p q r s t u v w"),
            (2, "p q r s p q r s"),
            (3, "x y z w q a b c d"),
            (4, "p q r s t u v w x y"),
        ])).collect()
        assert len(rows) == 4
        for r in rows:
            assert 0.5 <= r.softdedup_weight <= 1.0
