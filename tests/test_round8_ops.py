"""Round-8 additions: PII redaction, sliding-window top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from examples_scala_spark.operators.text import PII_PATTERNS, pii_redact


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPiiRedact:
    def test_counts_and_replacement(self, spark):
        out = pii_redact(_docs(spark, [
            (1, "mail a@b.org and c.d+x@e-f.co phone +1-212-555-0142 "
                "ip 10.0.0.1 end"),
        ])).collect()[0]
        assert out.n_emails == 2
        assert out.n_phones == 1
        assert out.n_ipv4s == 1
        assert out.redacted == ("mail <EMAIL> and <EMAIL> phone <PHONE> "
                                "ip <IP> end")
        assert out.redacted_len == len(out.redacted)

    def test_clean_text_passthrough(self, spark):
        txt = "no personal data here just words and 42 numbers"
        out = pii_redact(_docs(spark, [(7, txt)])).collect()[0]
        assert (out.n_emails, out.n_phones, out.n_ipv4s) == (0, 0, 0)
        assert out.redacted == txt

    def test_email_domain_not_double_redacted(self, spark):
        # the mail domain contains dots; email redaction runs first
        # and consumes the whole address, so the ipv4 pass sees only
        # the standalone IP. A digit-TLD impostor (u@1.2.3.44) is NOT
        # an email — [.][A-Za-z]{2,} rejects it — and its dotted quad
        # is redacted as an IP instead.
        out = pii_redact(_docs(spark, [
            (2, "x u@a.b.org 1.2.3.4 y"),
            (3, "x u@1.2.3.44 y"),
        ])).orderBy("doc_id").collect()
        assert (out[0].n_emails, out[0].n_ipv4s) == (1, 1)
        assert out[0].redacted == "x <EMAIL> <IP> y"
        assert (out[1].n_emails, out[1].n_ipv4s) == (0, 1)
        assert out[1].redacted == "x u@<IP> y"

    def test_adjacent_and_repeated_matches(self, spark):
        out = pii_redact(_docs(spark, [
            (3, "10.1.2.3 10.4.5.6 +1-800-555-1234 +1-800-555-1234"),
        ])).collect()[0]
        assert out.n_ipv4s == 2 and out.n_phones == 2
        assert out.redacted == "<IP> <IP> <PHONE> <PHONE>"

    def test_patterns_have_no_backslash_escapes(self):
        # the Java-regex / RE2 equivalence argument rests on using
        # only bracket classes — a backslash shorthand sneaking in
        # would silently fork the two engines' semantics
        for _, pat, tok in PII_PATTERNS:
            assert "\\" not in pat, pat
            assert not any(ch.isdigit() or ch in "@." for ch in tok), tok


class TestSlidingTopK:
    def test_rank_and_tiebreak(self, spark):
        # one hour 0:00-1:00; events at minute 5 land in windows
        # starting -45,-30,-15,0 min. Counts: a=3, b=3, c=1 -> rank
        # a(1) b(2) by name tie-break, c(3).
        rows = [(i, t, k) for i, (t, k) in enumerate(
            [(300.0, "a"), (300.0, "a"), (310.0, "a"),
             (300.0, "b"), (305.0, "b"), (310.0, "b"),
             (300.0, "c")])]
        ev = spark.createDataFrame(
            rows, "event_id long, t double, event_type string").select(
            "event_type",
            F.timestamp_micros((F.col("t") * 1_000_000).cast("long"))
             .alias("ts"))
        # the SHIPPED plan (operators/aggregations.py:sliding_topk is
        # what REGISTRY['w_sliding_topk'] calls), not an inline
        # re-implementation that could drift (ADVICE r8)
        from examples_scala_spark.operators.aggregations import sliding_topk
        out = (sliding_topk(ev)
               .filter(F.col("window_start") == 0)
               .orderBy("rnk").collect())
        assert [(r.event_type, r.cnt, r.rnk) for r in out] == [
            ("a", 3, 1), ("b", 3, 2), ("c", 1, 3)]


class TestSignPackHamming:
    def test_sign_pack_known_bits(self, spark):
        from examples_scala_spark.operators.similarity import sign_pack_expr
        df = spark.createDataFrame(
            [(1, [1.0, -1.0, 0.0, 2.0])], "vec_id long, embedding array<double>")
        r = df.select(sign_pack_expr("embedding", 0, 4).alias("w")).collect()[0]
        # bit0: 1.0>0 set; bit1: -1.0 no; bit2: 0.0 NOT >0; bit3: 2.0 set
        assert r.w == 0b1001

    def test_hamming_topk_exact_distances(self, spark):
        from examples_scala_spark.operators.similarity import hamming_topk
        # 4-dim vectors, query id 0; signs: v0=1111, v1=1110, v2=0000
        rows = [(0, [1.0, 1.0, 1.0, 1.0]),
                (1, [1.0, 1.0, 1.0, -1.0]),
                (2, [-1.0, -1.0, -1.0, -1.0]),
                (3, [1.0, -1.0, 1.0, -1.0])]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = hamming_topk(emb, k=3, query_mod=100, dim=4)
        got = [(r.neighbor_id, r.hamming, r.rank)
               for r in out.orderBy("rank").collect()]
        assert got == [(1, 1, 1), (3, 2, 2), (2, 4, 3)]


class TestDupNgramCharFraction:
    def _run(self, spark, text):
        from examples_scala_spark.operators.text import dup_ngram_char_fraction
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return dup_ngram_char_fraction(df, n=5).collect()[0]

    def test_repeated_gram_union_coverage(self, spark):
        # "a b c d e" occurs at word positions 0 and 5; coverage is the
        # UNION 0..9 (10 of 11 single-char words)
        r = self._run(spark, "a b c d e a b c d e x")
        assert (r.n_words, r.word_chars, r.dup_ngram_chars) == (11, 11, 10)
        assert r.dup_char_frac == round(10 / 11, 6)

    def test_overlapping_grams_count_positions_once(self, spark):
        # both 5-grams of six identical words are duplicates; the union
        # covers every position exactly once -> fraction 1.0
        r = self._run(spark, "a a a a a a")
        assert (r.dup_ngram_chars, r.dup_char_frac) == (6, 1.0)

    def test_no_duplicates(self, spark):
        r = self._run(spark, "a b c d e f")
        assert (r.dup_ngram_chars, r.dup_char_frac) == (0, 0.0)

    def test_short_doc_has_no_grams(self, spark):
        r = self._run(spark, "a b c")
        assert (r.n_words, r.dup_ngram_chars, r.dup_char_frac) == (3, 0, 0.0)
