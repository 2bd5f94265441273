"""Round-9 continuation operators: SoftDeDup reweighting (and the
other late-round additions as they land)."""

from __future__ import annotations

from examples_scala_spark.operators.text import softdedup_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


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
