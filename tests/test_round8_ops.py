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
        agg = (ev.groupBy(F.window("ts", "1 hour", "15 minutes"),
                          "event_type")
               .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
        w = __import__("pyspark.sql.window", fromlist=["Window"]).Window \
            .partitionBy("window").orderBy(F.col("cnt").desc(), "event_type")
        out = (agg.withColumn("rnk", F.row_number().over(w).cast("long"))
               .filter(F.col("rnk") <= 3)
               .filter(F.col("window.start").cast("long") == 0)
               .orderBy("rnk").collect())
        assert [(r.event_type, r.cnt, r.rnk) for r in out] == [
            ("a", 3, 1), ("b", 3, 2), ("c", 1, 3)]
