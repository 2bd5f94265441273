"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a document
table (doc_id BIGINT, text STRING). All are pure DataFrame pipelines —
no Python UDFs — so at 100 TB they are shuffle-bound, not CPU-bound:

- exact:    one groupBy on a 128-bit content hash (map-side partial agg).
- minhash:  explode shingles -> one groupBy(doc) computing all H minima
            -> band keys -> groupBy(band) to bucket candidates ->
            verify. The only wide ops are two groupBys and the
            candidate self-join, which is restricted to LSH buckets
            (linear in collisions, never O(n^2)).
- simhash:  one explode + one groupBy(doc) with 32 conditional sums.
- jaccard:  shingle-explode self-join, equi-join on shingle hash — the
            classic sparse-similarity join; prune-by-frequency keeps
            hot shingles from exploding (df cap).

Hashing is engine-neutral: base hash = first 15 hex digits of md5
(60 bits, exactly reproducible in DuckDB via ('0x'||substr(md5(x),1,15))::BIGINT),
then universal hashing h_i(x) = (a_i*(x mod p) + b_i) mod p with
p = 2^31-1 — all int64-safe arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scalar import ratio6
from ..session import scoped_shuffle_partitions

P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
# Deterministic universal-hash parameters; same constants are inlined in
# the DuckDB oracle SQL.
def _hash_params(h: int) -> list[tuple[int, int]]:
    return [((2 * i + 1) * 2654435761 % P, (i * 40503 + 17) % P) for i in range(h)]


def content_hash(col) -> F.Column:
    """128-bit content hash for exact dedup (md5 — same on any engine)."""
    return F.md5(col)


def base_hash(col) -> F.Column:
    """60-bit engine-neutral hash: first 15 hex chars of md5 as BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the smallest doc_id per identical text.
    Single shuffle on the md5; the text column itself never shuffles."""
    return (
        docs.select(F.col(id_col), content_hash(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def _grams_expr(n: int) -> F.Column:
    """n-gram array over a pre-split `__w` words column.
    Guard: sequence(1, 0) in Spark is DESCENDING [1,0], so docs with
    fewer than n words need an explicit empty-array branch."""
    return F.expr(
        f"CASE WHEN size(__w) >= {n} "
        f"THEN transform(sequence(1, size(__w) - {n - 1}), "
        f"i -> array_join(slice(__w, i, {n}), ' ')) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", distinct: bool = True) -> DataFrame:
    """Word n-gram shingles per doc: (doc_id, shingle).
    Pure SQL expressions -> codegen'd, no Python. The words array is
    materialized once per row (not re-split per gram). distinct=True
    dedupes per doc with array_distinct BEFORE the explode — identical
    to a global (doc_id, shingle) distinct but ZERO shuffle;
    distinct=False skips even that for consumers where duplicates are
    harmless (MinHash minima)."""
    words = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__w"),
    )
    grams = _grams_expr(n)
    if distinct:
        grams = F.array_distinct(grams)
    return words.select(F.col(id_col), F.explode(grams).alias("shingle"))


def minhash_signatures(docs: DataFrame, num_hashes: int = 16, n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature as columns mh_0..mh_{H-1}.
    One explode + one groupBy(doc) computing all H minima at once
    (partial aggregation collapses shingles map-side)."""
    # duplicates don't change minima — skip the distinct shuffle
    sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col,
                       distinct=False)
    x = (base_hash(F.col("shingle")) % P).alias("x")
    sh = sh.select(F.col(id_col), x)
    aggs = [
        F.min((F.col("x") * F.lit(a) + F.lit(b)) % F.lit(P)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_hash_params(num_hashes))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_delta(prior_sigs: DataFrame, changes: DataFrame,
                  num_hashes: int = 16, n: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  op_col: str = "op") -> DataFrame:
    """Incrementally maintain a MinHash signature table under a
    document changelog instead of recomputing the corpus.

    `changes` is (id, op, text) with op in {'upsert', 'delete'} — the
    shape a CDC feed or a curation pass emits. Shingling + hashing run
    ONLY over the upserted documents (changelog-sized work, not
    corpus-sized); the prior signature table is then anti-joined
    against the changed ids and unioned with the fresh signatures.
    The changed-id side is broadcast, so the 100 TB signature table is
    never shuffled — maintenance cost is O(|changelog|) + one broadcast
    scan of the priors. The result is bit-identical to a full recompute
    over the updated corpus (asserted in tests and by the
    minhash_incremental oracle).
    """
    changed_ids = changes.select(F.col(id_col)).distinct()
    fresh = minhash_signatures(
        changes.filter(F.col(op_col) == "upsert").select(id_col, text_col),
        num_hashes=num_hashes, n=n, text_col=text_col, id_col=id_col)
    kept = prior_sigs.join(F.broadcast(changed_ids), on=id_col,
                           how="left_anti")
    return kept.unionByName(fresh)


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                      n: int = 3, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """MinHash-LSH near-dup pairs: band signatures -> bucket join ->
    verify by signature similarity >= threshold.

    Returns (doc_a, doc_b, sig_sim) with doc_a < doc_b. The candidate
    join is per-band-bucket (equi-join on the band key), so cost is
    linear in true collisions — the property that makes this the 100 TB
    dedup strategy.
    """
    sig = minhash_signatures(docs, num_hashes, n, text_col, id_col)
    return lsh_pairs_from_sigs(sig, num_hashes=num_hashes, bands=bands,
                               threshold=threshold, id_col=id_col)


def lsh_pairs_from_sigs(sig: DataFrame, num_hashes: int = 16,
                        bands: int = 4, threshold: float = 0.5,
                        id_col: str = "doc_id",
                        materialize: bool = True,
                        max_bucket_docs: int | None = None) -> DataFrame:
    """Banding + bucket join + in-aggregate verification over an
    ALREADY-COMPUTED signature table — the re-banding entry point: a
    parameter sweep (or an incremental run against stored signatures)
    shingles the corpus once and tries several (bands, rows) splits
    against the same `sig`.

    `max_bucket_docs` (r13, VERDICT r12 #6): the per-band bucket join
    is linear in TRUE collisions, but a degenerate band — every doc
    sharing one band hash, e.g. a boilerplate header that dominates
    short docs — produces a quadratic bucket whose pair OUTPUT is
    itself quadratic, so no rewrite can keep it linear without
    changing the result. When set, buckets with more than this many
    docs are excluded from pair generation BEFORE the self-join — the
    same boilerplate guard winnow_fingerprint_pairs applies to
    fingerprints in > 50 docs and the prefix-filtered set-similarity
    join applies via its df cap. This trades recall on boilerplate-
    only pairs for a hard bound on per-bucket work (the guarded run
    does O(sum min(|bucket|, N)^2) instead of O(sum |bucket|^2)).
    Default None keeps the declared queries' results byte-identical;
    at 100 TB set it to a few thousand (a true near-dup cluster that
    large is boilerplate by definition — Lee et al. 2022 make the
    same argument for ExactSubstr's hot suffixes)."""
    rows = num_hashes // bands

    # r12: the band self-join consumes `sig` on BOTH sides, and the
    # broadcast build defeats exchange reuse — without materialization
    # the whole upstream pipeline (corpus scan -> shingle explode ->
    # 16-min aggregate) executes TWICE per action (4 scans in the
    # plan). A lazy localCheckpoint pins the narrow signature table
    # (17 longs per doc — row-count-sized, payload-free) so both join
    # sides read it; measured at sf0.1: fresh-compute 4.2 s -> 1.0 s,
    # plan scans 4 -> 0. At 100 TB this halves the dominant corpus
    # scan; the checkpoint is the operator's own working set
    # (MEMORY_AND_DISK, spills cleanly). A caller that ALREADY pinned
    # `sig` (lsh_band_sweep checkpoints the shared signature table once
    # for three band configs) passes materialize=False so each config
    # does not persist a redundant copy of the same rows in the block
    # manager (r12 ADVICE).
    if materialize:
        sig = sig.localCheckpoint(eager=False)

    band_cols = [
        F.md5(F.concat_ws(",", *[F.col(f"mh_{b * rows + r}").cast("string")
                                 for r in range(rows)])).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *[F.col(f"mh_{i}") for i in range(num_hashes)],
                        *band_cols)

    # the full signature rides the band shuffle (16 longs per row), so
    # verification happens INSIDE the pair aggregation (max() of the
    # constant-per-pair minima) — no candidate distinct and no verify
    # joins back to the signature table. Measured at sf0.1: 4 shuffles
    # -> 2, 1.6s -> 1.35s, identical pairs.
    band_kv = banded.select(
        F.col(id_col),
        *[F.col(f"mh_{i}") for i in range(num_hashes)],
        F.explode(F.array(*[
            F.concat_ws("|", F.lit(str(b)), F.col(f"band_{b}")) for b in range(bands)
        ])).alias("bucket"),
    )
    if max_bucket_docs is not None:
        # degenerate-bucket guard: pin the narrow (bucket, id, sig)
        # rows so the hot-bucket aggregate and both join sides share
        # one execution, then anti-join the oversized buckets away
        band_kv = band_kv.localCheckpoint(eager=False)
        hot = (band_kv.groupBy("bucket")
               .agg(F.count("*").alias("nd"))
               .filter(F.col("nd") > max_bucket_docs)
               .select("bucket"))
        band_kv = band_kv.join(hot, "bucket", "left_anti")
    pairs = (
        band_kv.alias("l")
        .join(band_kv.alias("r"), on="bucket")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("doc_a"),
                 F.col(f"r.{id_col}").alias("doc_b"))
        .agg(*[F.max(F.col(f"l.mh_{i}")).alias(f"la_{i}")
               for i in range(num_hashes)],
             *[F.max(F.col(f"r.mh_{i}")).alias(f"lb_{i}")
               for i in range(num_hashes)])
    )
    matches = sum(
        (F.col(f"la_{i}") == F.col(f"lb_{i}")).cast("int") for i in range(num_hashes)
    )
    return (
        pairs.withColumn("sig_sim", matches / F.lit(float(num_hashes)))
        .filter(F.col("sig_sim") >= threshold)
        .select("doc_a", "doc_b", "sig_sim")
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Per-doc SimHash fingerprint (bits-wide, default 32).
    explode tokens -> 60-bit token hash -> per-bit +/-1 vote ->
    fingerprint = sum(bit_j << j). One explode + one groupBy."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    toks = toks.select(F.col(id_col), base_hash(F.col("tok")).alias("x"))
    votes = [
        F.sum(F.when(F.expr(f"(x >> {j}) & 1") == 1, 1).otherwise(-1)).alias(f"v_{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fingerprint = sum(
        F.when(F.col(f"v_{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(bits)
    )
    return agg.select(F.col(id_col), fingerprint.cast("bigint").alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       bits: int = 32, **kw) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.
    Scale path: block on 4 byte-bands of the fingerprint (a pair within
    hamming 3 of a 32-bit hash must agree on >= 1 of 4 bytes), then
    verify with bit_count(xor)."""
    # r12: the byte-band self-join reads `fp` on both sides — pin the
    # 2-longs-per-doc fingerprint table so the token explode + 32-vote
    # aggregate runs once per action, not twice (see
    # lsh_pairs_from_sigs).
    fp = simhash(docs, bits=bits, **kw).localCheckpoint(eager=False)
    id_col = kw.get("id_col", "doc_id")   # simhash renames its id
    bands = fp.select(
        F.col(id_col).alias("doc_id"), "simhash",
        F.explode(F.array(*[
            F.concat_ws("|", F.lit(str(b)),
                        F.expr(f"(simhash >> {b * 8}) & 255").cast("string"))
            for b in range(4)
        ])).alias("bucket"),
    )
    cand = (
        bands.alias("l").join(bands.alias("r"), "bucket")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("l.simhash").alias("sh_a"),
                F.col("r.doc_id").alias("doc_b"), F.col("r.simhash").alias("sh_b"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        df_cap: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs with
    |A∩B| / |A∪B| >= threshold, doc_a < doc_b.

    Sparse-join strategy: explode distinct shingles, equi-join on
    shingle, count intersections, recover union from per-doc sizes.
    At 100 TB, cap shingle document-frequency (drop shingles appearing
    in > df_cap docs) to bound the join fan-out — standard ppjoin-style
    pruning (not applied at test SF for oracle exactness).
    """
    # join on the 60-bit shingle hash, not the string: the shuffle
    # carries 8-byte keys instead of full n-grams (the dominant cost at
    # scale); the oracle mirrors the same hashing so results stay
    # engine-identical even under (negligible) collisions.
    # NOTE (measured at sf0.1): the "narrow" alternative — array_distinct
    # + size before the explode — is 3-7x SLOWER here: interpreted
    # higher-order functions lose to the codegen explode->md5->Tungsten
    # distinct, and the self-join consumes the distinct's exchange
    # output instead of recomputing the text pipeline per side.
    from pyspark.sql.window import Window

    sh = (
        word_shingles(docs, n=n, text_col=text_col, id_col=id_col,
                      distinct=False)
        .select(F.col(id_col), base_hash(F.col("shingle")).alias("shingle"))
        .distinct()
        .withColumn("sz", F.count("*").over(Window.partitionBy(id_col)))
    )
    if df_cap is not None:
        # ppjoin-style pruning: a shingle appearing in > df_cap docs
        # contributes O(df²) candidate pairs but almost no Jaccard
        # signal (stop-phrase). Dropping it bounds the self-join
        # fan-out at 100 TB; Jaccard is then computed over the pruned
        # shingle space (sizes and intersections stay consistent).
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
               .filter(F.col("df") > df_cap).select("shingle"))
        # sizes must reflect the PRUNED shingle space — recount per doc
        sh = (sh.join(hot, "shingle", "left_anti").drop("sz")
              .withColumn("sz", F.count("*").over(Window.partitionBy(id_col))))
    # sizes ride THROUGH the self-join (one extra long per row) and
    # survive the pair aggregation as max() — no post-join size joins.
    # r12: both self-join sides consume `sh`; without materialization
    # the shingle explode + distinct + size-window pipeline runs TWICE
    # per action (4 parquet scans in the plan). Lazy-checkpoint the
    # narrow (id, 60-bit hash, sz) rows so the corpus is scanned once;
    # same rationale as lsh_pairs_from_sigs above.
    sh = sh.localCheckpoint(eager=False)
    inter = (
        sh.alias("l").join(sh.alias("r"), "shingle")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("doc_a"),
                 F.col(f"r.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("inter"),
             F.max("l.sz").alias("sz_a"), F.max("r.sz").alias("sz_b"))
    )
    out = (
        inter
        .withColumn("jaccard",
                    F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        # count/count ratio: exact half-up at 6 dp (r13 tie class)
        .select("doc_a", "doc_b",
                ratio6(F.col("inter"),
                       F.col("sz_a") + F.col("sz_b") - F.col("inter"))
                .alias("jaccard"))
    )
    return out


def shingle_hashes(d: DataFrame, n: int, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id, sz, shingle): per-doc DISTINCT word-n-gram 60-bit hashes,
    sz = the doc's distinct shingle count riding on every row. The
    ONE shingle pipeline behind benchmark_overlap AND
    bloom.bloom_benchmark_overlap — those two are specified (and
    tested) bit-identical, so the tokenization must live in exactly
    one place (r11 review find: it was duplicated line-for-line in
    both files). The distinct-gram array is materialized once per row
    before size/explode so array_distinct isn't evaluated twice."""
    words = d.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__w"))
    base = words.select(
        F.col(id_col), F.array_distinct(_grams_expr(n)).alias("__sh"))
    return (base.select(F.col(id_col), F.size("__sh").alias("sz"),
                        F.explode("__sh").alias("g"))
            .select(F.col(id_col), "sz",
                    base_hash(F.col("g")).alias("shingle")))


def benchmark_overlap(docs: DataFrame, bench_docs: DataFrame, n: int = 5,
                      frac_threshold: float = 0.1,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Decontamination: per-corpus-doc n-gram overlap against a
    benchmark/eval set. Returns (doc_id, n_shingles, n_overlap,
    overlap_frac, contaminated) for docs with >= n words.

    Scale shape: eval sets are small by construction, so the distinct
    benchmark shingle index broadcasts to every executor and the check
    is a narrow per-doc pipeline + ONE groupBy(doc) — no corpus-sized
    join, no second pass. The per-doc distinct and size are computed
    with array_distinct/size before the explode (single consumer, so
    the narrow form wins — see the Jaccard note for the counter-case).
    """
    def _sh(d: DataFrame):
        return shingle_hashes(d, n, text_col, id_col)

    bench = (_sh(bench_docs).select("shingle").distinct()
             .withColumn("hit", F.lit(1)))
    j = _sh(docs).join(F.broadcast(bench), "shingle", "left")
    out = j.groupBy(id_col).agg(
        F.max("sz").alias("n_shingles"),
        F.count("hit").alias("n_overlap"))
    return out.select(
        F.col(id_col), F.col("n_shingles").cast("bigint"),
        F.col("n_overlap").cast("bigint"),
        ratio6(F.col("n_overlap"), F.col("n_shingles"))
         .alias("overlap_frac"),
        (F.col("n_overlap") / F.col("n_shingles") >= frac_threshold)
        .alias("contaminated"))


def embedding_near_pairs(emb: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force; the ANN variants in
    similarity.py are the scale path). Dot/norms computed in DOUBLE via
    JVM higher-order functions — no Python in the loop."""
    v = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    v = v.withColumn("norm", norm)
    pairs = (
        v.alias("l").join(v.alias("r"), F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("doc_a"),
            F.col(f"r.{id_col}").alias("doc_b"),
            (
                F.aggregate(F.zip_with("l.v", "r.v", lambda a, b: a * b),
                            F.lit(0.0), lambda acc, x: acc + x)
                / (F.col("l.norm") * F.col("r.norm"))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b", F.round("cos", 6).alias("cos"))
    )
    return pairs


def substring_dup_stats(docs: DataFrame, L: int = 30,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Exact duplicated-substring statistics, ExactSubstr-style: for
    every char offset, hash the length-L substring; an offset is
    'duplicated' if its substring occurs >= 2 times anywhere in the
    corpus (including within the same doc). Returns per doc
    (doc_id, n_positions, n_dup, dup_frac).

    This is the char-level complement of the passage/shingle family:
    it catches boilerplate that crosses token and sentence boundaries.

    Scale shape: positions = total corpus chars — linear, the
    information content of the problem. Substrings never leave the
    executor: the transform hashes each window to a 60-bit int inside
    the array builder, so the explode emits 8-byte longs (not L-char
    strings), and the two shuffles (count per hash, join-back + per-doc
    count) move longs only. The rolling-hash mapInPandas variant would
    cut the per-window md5 CPU, not the shuffle volume — this form
    stays engine-reproducible (same md5-prefix idiom as the shingle
    ops, collision-identical to the oracle)."""
    base = docs.select(
        F.col(id_col), F.col(text_col).alias("t"),
        F.length(text_col).cast("bigint").alias("n"))
    # the per-window md5 is ~150 ns/char of CPU, far above the ~ns/byte
    # cost of shipping the text once — so do NOT let the hashing stage
    # inherit the scan's parallelism (a single small parquet file = one
    # task doing all the hashing; measured 6x at sf0.1). At production
    # scale input splits usually exceed cores and this exchange
    # AQE-coalesces to a no-op-sized shuffle of one text copy.
    par = docs.sparkSession.sparkContext.defaultParallelism
    eligible = base.filter(F.col("n") >= L).repartition(par)
    # materialize the hashed positions once: they feed BOTH the global
    # hash-count and the join-back, and the per-window md5 is the
    # dominant CPU — recomputing it doubles the query
    pos = eligible.select(
        F.col(id_col), (F.col("n") - (L - 1)).alias("n_positions"),
        F.explode(F.expr(
            f"transform(sequence(1L, n - {L - 1}L), "
            f"i -> CAST(conv(substr(md5(substring(t, i, {L})), 1, 15), "
            f"16, 10) AS BIGINT))")).alias("g")).localCheckpoint(eager=False)
    dup_hashes = (pos.groupBy("g").agg(F.count("*").alias("c"))
                  .filter(F.col("c") >= 2).select("g"))
    # fact-fact join: dup_hashes is corpus-derived — pin SHJ so the
    # planner can never elect a corpus-sized broadcast (the 100x probe
    # caught exactly that: a 12 GiB BroadcastExchange in the suffix
    # twin of this join)
    per_doc = (pos.join(dup_hashes.hint("shuffle_hash"), "g")
               .groupBy(id_col).agg(F.count("*").alias("n_dup")))
    out = (eligible.select(F.col(id_col),
                           (F.col("n") - (L - 1)).alias("n_positions"))
           .join(per_doc, id_col, "left")
           .withColumn("n_dup", F.coalesce("n_dup", F.lit(0))))
    return out.select(
        F.col(id_col), F.col("n_positions").cast("bigint"),
        F.col("n_dup").cast("bigint"),
        ratio6(F.col("n_dup"), F.col("n_positions"))
         .alias("dup_frac"))

def substring_dedup_rewrite(docs: DataFrame, L: int = 30,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """ExactSubstr deduplication WITH text rewriting (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    length-L char window whose content occurs >= 2 times in the corpus
    is removed from every occurrence EXCEPT the globally first one
    (min (doc_id, offset)), and each document's text is rebuilt from
    the surviving characters. The curation-pass counterpart of
    `substring_dup_stats`, which only measures — this one emits the
    cleaned corpus. (As in the paper's implementation, a kept first
    occurrence may itself lose characters to a different duplicated
    window that overlaps it.)

    Returns (doc_id, clean_text, n_chars_removed, n_dup_spans) for
    every input doc; docs shorter than L, or with no duplicated
    windows, pass through untouched.

    Scale shape: identical skeleton to substring_dup_stats — windows
    are hashed to 60-bit ints inside the scan, so the explode and both
    shuffles (first-occurrence aggregate on hash; join-back) move only
    8-byte longs plus one (doc_id, offset) pair per REMOVED window.
    The per-doc rebuild is a single sorted-array fold (aggregate HOF,
    whole-stage codegen): sorted removal offsets -> interval union ->
    kept-segment concatenation, one pass, no char-level explode. The
    only corpus-sized shuffle payload is the rebuilt text itself,
    which is the output.

    Body = the two shared helpers (the r11 review found the window
    hashing and the whole interval-union fold duplicated verbatim
    here; substring_dedup_incremental already composed them):
    `_window_hashes` for the posexplode scan, the first-occurrence
    aggregate in between, `_rebuild_from_removals` for the fold."""
    pos = _window_hashes(docs, L, text_col, id_col) \
        .localCheckpoint(eager=False)
    # one aggregate gives both the dup filter and the keep-one winner
    firsts = (pos.groupBy("g")
              .agg(F.count("*").alias("c"),
                   F.min(F.struct(F.col(id_col).alias("d"),
                                  F.col("i").alias("i"))).alias("first"))
              .filter(F.col("c") >= 2)
              .select("g", "first"))
    # firsts is corpus-derived (one row per duplicated window) —
    # pin SHJ, never broadcast at scale
    removed = (pos.join(firsts.hint("shuffle_hash"), "g")
               .filter(~((F.col(id_col) == F.col("first.d"))
                         & (F.col("i") == F.col("first.i"))))
               .select(id_col, "i"))
    out = _rebuild_from_removals(
        docs.filter(F.length(text_col) >= L), removed, L,
        text_col, id_col)
    short = (docs.filter(F.length(text_col) < L)
             .select(F.col(id_col),
                     F.col(text_col).alias("clean_text"),
                     F.lit(0).cast("bigint").alias("n_chars_removed"),
                     F.lit(0).cast("bigint").alias("n_dup_spans")))
    return out.unionByName(short)


def substring_dedup_incremental(history: DataFrame, incoming: DataFrame,
                                L: int = 30, text_col: str = "text",
                                id_col: str = "doc_id") -> DataFrame:
    """Incremental ExactSubstr rewriting: clean an INCOMING batch
    against an immutable already-ingested HISTORY — the production
    shape of substring_dedup_rewrite, where yesterday's corpus never
    re-scans. An incoming window is removed iff its hash exists
    anywhere in history, or it duplicates within the incoming batch
    and is not the batch-first occurrence.

    When history ids precede incoming ids, this equals the FULL
    corpus rewrite restricted to the incoming docs (history holds
    every cross-batch first occurrence) — which is exactly how the
    oracle checks it.

    Scale shape: history contributes ONLY its distinct window-hash
    index (a join against 8-byte longs — in production a persisted,
    bucketed table appended per batch); the incoming batch pays the
    same hash-explode + keep-first aggregate as the batch operator,
    but sized to the DELTA, not the corpus. The rebuild fold is
    shared with substring_dedup_rewrite."""
    hist_idx = (_window_hashes(history, L, text_col, id_col)
                .select("g").distinct())
    pos = _window_hashes(incoming, L, text_col, id_col) \
        .localCheckpoint(eager=False)
    # hist_idx is history-corpus-sized — pin SHJ on all three joins
    in_hist = (pos.join(hist_idx.hint("shuffle_hash"), "g", "leftsemi")
               .select(id_col, "i"))
    batch_firsts = (pos.join(hist_idx.hint("shuffle_hash"), "g",
                             "left_anti")
                    .groupBy("g")
                    .agg(F.count("*").alias("c"),
                         F.min(F.struct(F.col(id_col).alias("d"),
                                        F.col("i").alias("i")))
                          .alias("first"))
                    .filter(F.col("c") >= 2)
                    .select("g", "first"))
    in_batch = (pos.join(batch_firsts.hint("shuffle_hash"), "g")
                .filter(~((F.col(id_col) == F.col("first.d"))
                          & (F.col("i") == F.col("first.i"))))
                .select(id_col, "i"))
    removed = in_hist.unionByName(in_batch).distinct()
    return _rebuild_from_removals(incoming, removed, L, text_col, id_col)


def _window_hashes(docs: DataFrame, L: int, text_col: str,
                   id_col: str, with_len: bool = False) -> DataFrame:
    """(doc_id, i, g): 60-bit hash of every length-L window, offsets
    1-based — shared by the batch and incremental rewrite operators.
    with_len=True additionally carries the doc length `n` (8 bytes) —
    suffix_dup_spans derives each candidate's remaining-extension
    bound from it without a second text join."""
    base = docs.select(
        F.col(id_col), F.col(text_col).alias("t"),
        F.length(text_col).cast("bigint").alias("n"))
    par = docs.sparkSession.sparkContext.defaultParallelism
    eligible = base.filter(F.col("n") >= L).repartition(par)
    extra = [F.col("n")] if with_len else []
    return eligible.select(
        F.col(id_col), "t", "n",
        F.posexplode(F.expr(
            f"transform(sequence(1L, n - {L - 1}L), "
            f"i -> CAST(conv(substr(md5(substring(t, i, {L})), 1, 15), "
            f"16, 10) AS BIGINT))"))).select(
        F.col(id_col), (F.col("pos") + 1).cast("bigint").alias("i"),
        F.col("col").alias("g"), *extra)


def _rebuild_from_removals(docs: DataFrame, removed: DataFrame, L: int,
                           text_col: str, id_col: str) -> DataFrame:
    """Rebuild every doc's text from its removal offsets with the
    sorted-offset interval-union fold (see substring_dedup_rewrite)."""
    base = docs.select(
        F.col(id_col), F.col(text_col).alias("t"),
        F.length(text_col).cast("bigint").alias("n"))
    starts = removed.groupBy(id_col).agg(
        F.array_sort(F.collect_list("i")).alias("ss"))
    E = L - 1
    rebuilt = F.expr(f"""
      aggregate(
        ss,
        named_struct('cov', 0L, 'out', '', 'rm', 0L, 'sp', 0L),
        (st, s) -> named_struct(
          'cov', greatest(st.cov, s + {E}L),
          'out', CASE WHEN s > st.cov + 1
                 THEN concat(st.out, substring(t, CAST(st.cov AS INT) + 1,
                                               CAST(s - 1 - st.cov AS INT)))
                 ELSE st.out END,
          'rm', st.rm + greatest(s + {E}L, st.cov) - greatest(s - 1L, st.cov),
          'sp', st.sp + CASE WHEN s > st.cov + 1 OR st.cov = 0L
                        THEN 1L ELSE 0L END),
        st -> named_struct(
          'cov', st.cov,
          'out', concat(st.out, substring(t, CAST(st.cov AS INT) + 1,
                                          CAST(n - st.cov AS INT))),
          'rm', st.rm, 'sp', st.sp))""")
    cleaned = (base.join(starts, id_col, "left")
               .select(F.col(id_col), "t",
                       F.when(F.col("ss").isNull(), None)
                        .otherwise(rebuilt).alias("st")))
    return cleaned.select(
        F.col(id_col),
        F.coalesce(F.col("st.out"), F.col("t")).alias("clean_text"),
        F.coalesce(F.col("st.rm"), F.lit(0)).cast("bigint")
         .alias("n_chars_removed"),
        F.coalesce(F.col("st.sp"), F.lit(0)).cast("bigint")
         .alias("n_dup_spans"))


def _lcp_expr(a: str, b: str) -> F.Column:
    """Length of the longest common prefix of two string columns,
    fully JVM-side: zip the char arrays with a null-safe equality,
    find the first mismatch. NULL b -> 0. No length cap is applied —
    callers pass chunk substrings that are already bounded."""
    mism = (f"array_position(zip_with(split({a}, ''), split({b}, ''), "
            f"(x, y) -> x <=> y), false)")
    return F.coalesce(
        F.expr(f"CASE WHEN {mism} = 0 THEN least(length({a}), length({b})) "
               f"ELSE {mism} - 1 END"),
        F.lit(0)).cast("bigint")


def suffix_dup_spans(docs: DataFrame, L: int = 30, chunk: int = 64,
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     distinct_reps: bool = True) -> DataFrame:
    """ExactSubstr with VARIABLE-LENGTH maximal repeated spans — the
    paper-exact form of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), whose reference implementation
    builds a corpus suffix array and reads maximal repeats off
    neighbor LCPs. Same output semantics, Spark-native construction:

    1. Candidates: positions whose length-L window occurs >= 2 times
       (p has a duplicated prefix of length >= L iff its L-window is
       duplicated — the window hash gives the candidate set exactly).
    2. dup_len(p) = L + the longest common extension beyond the
       window, against any other candidate sharing the window. Max
       LCP against a set of strings = max LCP with a lexicographic
       NEIGHBOR (the suffix-array property), so each round sorts
       each class by the next `chunk` chars (one Exchange + sort over
       candidates only), takes lag/lead LCPs, finalizes members whose
       best extension stops inside the chunk, and re-classes
       full-chunk matches by md5(class || chunk) for the next round.
       Members that finalize early can never carry a later max (their
       best LCP is < the survivors' matched length), so dropping them
       is exact; chunk sizes double per round (prefix doubling), so
       rounds = O(log(max_repeat_len / chunk)).
    3. Spans [p, p + dup_len(p)) are reduced per doc to the maximal
       ones (a span contained in an earlier-starting span has
       end <= running max end). Left-maximality is free: a
       left-extendable span is contained in its predecessor's span.

    Returns (doc_id, span_start, span_len) — one row per maximal
    duplicated span, 1-based offsets, span_len >= L.

    Scale shape: the corpus is scanned once for window hashes (8-byte
    longs through the shuffle, exactly `substring_dup_stats`); every
    later round touches CANDIDATES only, shipping `chunk` chars + a
    32-char class key per active member, and the active set shrinks
    monotonically (real corpora: most repeats end within 1-2 chunks).
    No all-pairs joins anywhere — degenerate classes (a million equal
    windows) cost one sort, not a quadratic self-join. The driver
    loop runs O(max_repeat/chunk) rounds with an eager
    localCheckpoint per round, mirroring the dedup_clusters CC loop.

    distinct_reps=True (default; ROADMAP r9, accepted on a 1.42x
    10x best-of-2 win: 160.7s -> 113.5s, identical 50018 spans)
    collapses identical chunks map-side before the per-round
    lexicographic sort, so the sort runs over distinct chunks only
    and member rows rejoin on the 32-char class hash instead of
    carrying chunk text; False keeps the direct full-member window
    sort (the r7/r8 shape) for A/B."""
    base = docs.select(
        F.col(id_col), F.col(text_col).alias("t"),
        F.length(text_col).cast("bigint").alias("n"))
    par = docs.sparkSession.sparkContext.defaultParallelism
    texts = base.filter(F.col("n") >= L).repartition(par)
    pos = _window_hashes(docs, L, text_col, id_col, with_len=True)
    dup_hashes = (pos.groupBy("g").agg(F.count("*").alias("c"))
                  .filter(F.col("c") >= 2).select("g"))
    # the 100x probe failed HERE pre-fix: the planner broadcast the
    # corpus-derived dup_hashes side (12 GiB HashedRelation) — pin SHJ
    # `rem` = chars available beyond the already-matched prefix (an
    # upper bound on the remaining extension) — drives the adaptive
    # chunk schedule below at the cost of one long per row
    active = (pos.join(dup_hashes.hint("shuffle_hash"), "g")
              .select(F.col(id_col), "i",
                      F.col("g").cast("string").alias("cls"),
                      F.lit(L).cast("bigint").alias("matched"),
                      (F.col("n") - F.col("i") - F.lit(L - 1))
                      .cast("bigint").alias("rem"))
              # lazy: the n_active count below materializes it —
              # one Spark job instead of two (r12 job-fold)
              .localCheckpoint(eager=False))
    finals: list[DataFrame] = []
    wcls = Window.partitionBy("cls").orderBy("chunk", id_col, "i")
    csize = chunk
    n_active = active.count()
    spark = docs.sparkSession
    # r12: the loop's shuffles move candidate rows, not the corpus —
    # size them to that volume (the connected_components convention;
    # at real scale the candidate count drives the clamp back to the
    # session setting). Measured at sf0.1: 9.1 -> 6.9 s.
    with scoped_shuffle_partitions(spark, max(n_active, 1)):
      while n_active > 0:
        # adaptive chunk growth (r12): round 0 probes with the cheap
        # caller-set `chunk`; each later round jumps to the p95 of the
        # SURVIVORS' remaining-extension bound, clamped to [2x, 64x]
        # the previous chunk. Survivors proved they match the whole
        # previous chunk, and repeat lengths are heavy-tailed, so the
        # classic x2 prefix doubling pays a full candidate+text
        # shuffle per octave while the jump resolves long repeats in
        # O(1) extra rounds; the floor keeps the log2 worst-case, the
        # cap bounds the per-member payload when `rem` (an upper
        # bound, not an estimate) overshoots the true extension.
        # Results are chunk-schedule-invariant (brute-force reference
        # + chunk=8/16 tests + the full-suffix oracle all pin this).
        # candidates x texts is a FACT-FACT join at corpus scale: pin
        # it to a shuffled hash join so the planner can never elect to
        # broadcast the text table (whose in-memory row form is many
        # times its parquet stats — measured blowing past
        # driver.maxResultSize at the 50x probe)
        ext = (active.join(texts.hint("shuffle_hash"), id_col)
               .withColumn("chunk", F.expr(
                   f"substring(t, CAST(i + matched AS INT), {csize})"))
               .select(id_col, "i", "cls", "matched", "rem", "chunk"))
        # compute the extension and the would-be next class BEFORE the
        # checkpoint, then checkpoint only the slim row (ids, matched,
        # e, next class) — materializing chunk + lag + lead strings
        # tripled the per-round checkpoint payload (measured at the
        # 10x hostile corpus)
        # equality fast path: on repeat-dense corpora most rows match
        # a neighbor's ENTIRE chunk (77% in round 0 of the 10x
        # hostile probe) — plain string equality (early-exit JVM
        # compare) then answers e = len(chunk) and the char-wise LCP
        # expression only runs on the minority that diverge inside
        # the chunk (CASE branches are lazy in codegen)
        if distinct_reps:
            # distinct-representative variant (ROADMAP r9 sort
            # experiment): identical chunks collapse MAP-SIDE via the
            # partial aggregate (77% of round-0 rows full-match on the
            # hostile probe), so the lexicographic sort runs over
            # DISTINCT chunks only. Exact: for a chunk occurring >= 2
            # times, max-LCP = length(chunk) (an identical neighbor);
            # for a unique chunk, max-LCP over the class multiset =
            # max-LCP over its distinct values, and the lexicographic-
            # neighbor property holds on the distinct set. Members
            # rejoin on cls2 = md5(cls || chunk) — the group identity
            # AND the next-round class — shipping 32 hex chars
            # instead of the chunk text through the member shuffle.
            ext = ext.withColumn("cls2", F.md5(F.concat("cls", "chunk")))
            reps = (ext.groupBy("cls", "cls2")
                    .agg(F.count("*").alias("cnt"),
                         F.min("chunk").alias("chunk")))
            wrep = Window.partitionBy("cls").orderBy("chunk", "cls2")
            reps = (reps
                    .withColumn("pv", F.lag("chunk").over(wrep))
                    .withColumn("nx", F.lead("chunk").over(wrep))
                    .select("cls2",
                            F.when(F.col("cnt") >= 2,
                                   F.length("chunk").cast("bigint"))
                             .otherwise(
                                 F.greatest(_lcp_expr("chunk", "pv"),
                                            _lcp_expr("chunk", "nx")))
                             .alias("e")))
            ext = (ext.select(F.col(id_col), "i", "matched", "rem",
                              "cls2")
                   .join(reps.hint("shuffle_hash"), "cls2")
                   .select(F.col(id_col), "i", "matched", "rem", "e",
                           "cls2")
                   # lazy: the round's bookkeeping agg below
                   # materializes it (r12 job-fold)
                   .localCheckpoint(eager=False))
        else:
            full = (F.col("chunk").eqNullSafe(F.col("pv"))
                    | F.col("chunk").eqNullSafe(F.col("nx")))
            ext = (ext
                   .withColumn("pv", F.lag("chunk").over(wcls))
                   .withColumn("nx", F.lead("chunk").over(wcls))
                   .select(F.col(id_col), "i", "matched", "rem",
                           F.when(full, F.length("chunk").cast("bigint"))
                            .otherwise(
                                F.greatest(_lcp_expr("chunk", "pv"),
                                           _lcp_expr("chunk", "nx")))
                            .alias("e"),
                           F.md5(F.concat("cls", "chunk")).alias("cls2"))
                   # lazy: the round's bookkeeping agg below
                   # materializes it (r12 job-fold)
                   .localCheckpoint(eager=False))
        finals.append(
            ext.filter(F.col("e") < csize)
            .select(F.col(id_col), "i",
                    (F.col("matched") + F.col("e")).alias("dup_len")))
        active = (ext.filter(F.col("e") >= csize)
                  .select(F.col(id_col), "i",
                          F.col("cls2").alias("cls"),
                          (F.col("matched") + csize).alias("matched"),
                          (F.col("rem") - csize).alias("rem")))
        # one bookkeeping agg on the checkpointed round output gives
        # BOTH the loop-exit check (replacing a separate limit-count
        # job) and the survivors' remaining-extension p95 that sizes
        # the next chunk
        srow = (ext.filter(F.col("e") >= csize)
                .agg(F.count("*").alias("c"),
                     F.percentile_approx(F.col("rem") - csize, F.lit(0.95))
                     .alias("p95")).collect()[0])
        n_active = srow["c"]
        if n_active:
            csize = int(min(max(int(srow["p95"]), 2 * csize),
                            64 * csize))
    if not finals:  # no duplicated window anywhere
        return (active.sparkSession
                .createDataFrame([],
                                 f"{id_col} bigint, span_start bigint, "
                                 f"span_len bigint"))
    allf = finals[0]
    for f in finals[1:]:
        allf = allf.unionByName(f)
    wdoc = (Window.partitionBy(id_col).orderBy("i")
            .rowsBetween(Window.unboundedPreceding, -1))
    spans = (allf.withColumn("end", F.col("i") + F.col("dup_len"))
             .withColumn("pmax", F.max("end").over(wdoc)))
    return (spans.filter(F.col("pmax").isNull()
                         | (F.col("end") > F.col("pmax")))
            .select(F.col(id_col),
                    F.col("i").cast("bigint").alias("span_start"),
                    F.col("dup_len").cast("bigint").alias("span_len")))


def substring_dedup_scrub(docs: DataFrame, L: int = 30, chunk: int = 64,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """ExactSubstr in SCRUB mode: remove EVERY occurrence of every
    duplicated region (Lee et al. 2022's released implementation
    removes all copies by default; the keep-first variant is
    `substring_dedup_rewrite`). Built on the paper-exact span set:
    `suffix_dup_spans` finds the maximal duplicated spans, their
    per-doc interval union is folded out of the text in one pass
    (variable-width generalization of the rewrite's sorted-offset
    fold), and each doc returns (doc_id, clean_text,
    n_chars_removed, n_scrubbed_regions).

    Because the union char coverage of maximal spans equals the
    duplicated-L-window coverage (proven by test), an INDEPENDENT
    oracle exists: drop every char covered by any duplicated window.
    The Spark side never computes that formulation — agreement means
    the span detector, the containment filter, and the interval fold
    all compose correctly.

    Scale shape: suffix_dup_spans' (candidates-only prefix-doubling
    rounds) plus one span-sized shuffle and the per-doc fold — the
    only corpus-sized payload is the rebuilt text, i.e. the output."""
    base = docs.select(
        F.col(id_col), F.col(text_col).alias("t"),
        F.length(text_col).cast("bigint").alias("n"))
    spans = suffix_dup_spans(docs, L=L, chunk=chunk,
                             text_col=text_col, id_col=id_col)
    ivs = (spans.groupBy(id_col)
           .agg(F.array_sort(F.collect_list(F.struct(
               F.col("span_start").alias("s"),
               (F.col("span_start") + F.col("span_len") - 1).alias("e"))))
               .alias("ivs")))
    folded = F.expr("""
      aggregate(
        ivs,
        named_struct('cov', 0L, 'out', '', 'rm', 0L, 'sp', 0L),
        (st, iv) -> named_struct(
          'cov', greatest(st.cov, iv.e),
          'out', CASE WHEN iv.s > st.cov + 1
                 THEN concat(st.out, substring(t, CAST(st.cov AS INT) + 1,
                                               CAST(iv.s - 1 - st.cov AS INT)))
                 ELSE st.out END,
          'rm', st.rm + greatest(iv.e, st.cov) - greatest(iv.s - 1L, st.cov),
          'sp', st.sp + CASE WHEN iv.s > st.cov + 1 OR st.cov = 0L
                        THEN 1L ELSE 0L END),
        st -> named_struct(
          'cov', st.cov,
          'out', concat(st.out, substring(t, CAST(st.cov AS INT) + 1,
                                          CAST(n - st.cov AS INT))),
          'rm', st.rm, 'sp', st.sp))""")
    # per-doc interval lists are doc-count-sized (fact-sized at
    # corpus scale): shuffle join, never broadcast
    cleaned = (base.join(ivs.hint("shuffle_hash"), id_col, "left")
               .select(F.col(id_col), "t",
                       F.when(F.col("ivs").isNull(), None)
                        .otherwise(folded).alias("st")))
    return cleaned.select(
        F.col(id_col),
        F.coalesce(F.col("st.out"), F.col("t")).alias("clean_text"),
        F.coalesce(F.col("st.rm"), F.lit(0)).cast("bigint")
         .alias("n_chars_removed"),
        F.coalesce(F.col("st.sp"), F.lit(0)).cast("bigint")
         .alias("n_scrubbed_regions"))


def setsim_prefix_join(docs: DataFrame, n: int = 3,
                       t_num: int = 1, t_den: int = 2,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram-set Jaccard join via PPJoin-style PREFIX FILTERING
    — same result set as ngram_jaccard_pairs(threshold = t_num/t_den),
    different (and at high thresholds far cheaper) candidate
    generation.

    Why a second algorithm for the same join: the sparse equi-join
    explodes EVERY shingle into the self-join, so its cost is
    sum_s df(s)^2 over all shingles — dominated by common shingles
    regardless of threshold. Prefix filtering exploits the threshold:
    order the token universe by ascending document frequency (rarest
    first); a doc with sz tokens only indexes its first
    sz - ceil(t*sz) + 1 tokens. Two docs with Jaccard >= t MUST share
    a prefix token under any common global order (|A∩B| >= ceil(t*|A|)
    pigeonholes the prefix), so the join stays lossless while hot
    stop-shingles never enter the index. Verification then runs per
    CANDIDATE pair on sorted hash arrays (array_intersect), O(|doc|)
    each — no quadratic stage anywhere.

    Determinism: tokens are 60-bit md5 hashes; ceil(t*sz) is exact
    integer arithmetic ((t_num*sz + t_den - 1) DIV t_den) — no float
    threshold on the filtering path. Jaccard output is the same
    integer-ratio rounding as ngram_jaccard_pairs, so the two
    operators (and the shared oracle) hash-match bit-for-bit.

    Scale: df ranking is one map-combined groupBy(token); prefix index
    shuffles ~ (1-t) of the token mass; candidate dedup and the two
    array joins shuffle candidate pairs + per-doc arrays (bounded by
    doc length). Returns (doc_a, doc_b, jaccard), doc_a < doc_b.
    """
    from pyspark.sql.window import Window

    # r12: `tok` feeds the df ranking, the ranked/prefix index AND the
    # per-doc verification sets; `prefix` and `sets` each feed both
    # sides of a join. Unmaterialized, the shingle pipeline executed
    # SIX times per action (12 parquet scans in the plan). Three lazy
    # checkpoints of narrow long-typed tables pin each stage to one
    # computation — the corpus is now scanned once.
    tok = (word_shingles(docs, n=n, text_col=text_col, id_col=id_col,
                         distinct=False)
           .select(F.col(id_col), base_hash(F.col("shingle")).alias("tok"))
           .distinct().localCheckpoint(eager=False))
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = (tok.join(dfreq, "tok")
              .withColumn("pos", F.row_number().over(
                  Window.partitionBy(id_col).orderBy("df", "tok")))
              .withColumn("sz", F.count("*").over(
                  Window.partitionBy(id_col))))
    # lossless prefix: keep pos <= sz - ceil(t*sz) + 1, exact integers
    prefix = ranked.filter(
        F.col("pos") <= F.col("sz")
        - F.expr(f"({t_num} * sz + {t_den - 1}) DIV {t_den}") + 1) \
        .localCheckpoint(eager=False)
    cand = (prefix.alias("l").join(prefix.alias("r"), "tok")
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("doc_a"),
                    F.col(f"r.{id_col}").alias("doc_b"))
            .distinct())
    sets = tok.groupBy(id_col).agg(
        F.sort_array(F.collect_list("tok")).alias("toks"),
        F.count("*").alias("sz")).localCheckpoint(eager=False)
    joined = (cand
              .join(sets.select(F.col(id_col).alias("doc_a"),
                                F.col("toks").alias("ta"),
                                F.col("sz").alias("sz_a")), "doc_a")
              .join(sets.select(F.col(id_col).alias("doc_b"),
                                F.col("toks").alias("tb"),
                                F.col("sz").alias("sz_b")), "doc_b"))
    inter = F.size(F.array_intersect("ta", "tb"))
    return (joined
            .withColumn("inter", inter)
            .withColumn("jaccard",
                        F.col("inter")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .filter(F.col("jaccard") >= F.lit(t_num) / F.lit(t_den))
            .select("doc_a", "doc_b",
                    ratio6(F.col("inter"),
                           F.col("sz_a") + F.col("sz_b") - F.col("inter"))
                    .alias("jaccard")))
