"""Deduplication operators over the `documents` table — the training-data-pipeline
extensions (task brief): exact, MinHash+LSH, n-gram Jaccard, SimHash.

Engine-portability note: hash primitives are md5 hex strings (identical in Spark
and DuckDB), so every operator — SimHash included (60-bit md5-derived token
hash) — has an exact DuckDB oracle; min/max over hex strings is lexicographic
and deterministic. All operators are pure
DataFrame expressions (whole-stage codegen; no Python in the hot path).

Scale notes:
  * exact dedup = one hash-shuffle on the content key;
  * MinHash/LSH: signatures are embarrassingly parallel; the only shuffle is the
    band-bucket join (self-join on band_key, quadratic ONLY within a bucket —
    that is the point of banding); at 100 TB add a bucket-size cap / salting on
    hot bands before the pair join;
  * n-gram Jaccard is blocked (same band) before any pairwise work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..checkpointing import shared


def norm_text(col):
    """lowercase, collapse non-word runs to single spaces, trim; NULL as empty
    (the DuckDB oracles COALESCE the same way)."""
    return F.trim(F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))), r"\W+", " "))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep the min doc_id per normalized-content md5 (hash-groupBy dedup)."""
    return (
        docs.withColumn("content_key", F.md5(norm_text(F.col("text"))))
        .groupBy("content_key")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "content_key", "n_copies")
    )


def word_shingles(col, n: int):
    """Word n-gram shingles of the `text` column as array<string> (distinct,
    sorted). Expressed as a SQL lambda chain so the DuckDB oracle can mirror the
    exact same formula."""
    del col  # shingles always read the `text` column (SQL-parity formula below)
    words = "split(trim(regexp_replace(lower(coalesce(text, '')), '\\\\W+', ' ')), ' ')"
    # NB: Spark's sequence(1, 0) is DESCENDING (not empty) — guard short texts.
    # The split is bound to a lambda variable `w` via a 1-element-array
    # transform so it evaluates ONCE per row: textually inlining it in the
    # gram lambda re-runs the regexp+split per shingle ELEMENT (~n_words
    # evaluations per doc — the digest-pass hazard minhash_signatures already
    # documents, measured ~30x on the 2 M-doc corpus for the same shape).
    grams = F.expr(
        f"flatten(transform(array({words}), w -> "
        f"case when size(w) >= {n} then "
        f"transform(sequence(1, size(w) - {n - 1}), "
        f"i -> array_join(slice(w, i, {n}), ' ')) "
        f"else array() end))"
    )
    return F.array_sort(F.array_distinct(grams))


def _fan_out(docs: DataFrame) -> DataFrame:
    """Spread a narrow scan across the cluster before the shingle/digest pass.

    Parquet splits stop at row-group granularity: a producer that wrote one
    giant row group (the driver's testdata does) pins the whole
    CPU-dominant hashing pass to a single task regardless of
    maxPartitionBytes — measured 51 s -> 6.6 s for the signature pass on the
    sf0.1 documents table at local[32]. The repartition is a no-op cost at
    scale (real corpora arrive in thousands of splits and skip this branch).
    """
    n = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < n:
        return docs.repartition(n)
    return docs


MINHASH_P = 2_147_483_647  # 2^31 - 1


def minhash_signatures(docs: DataFrame, n_hashes: int = 12, shingle_n: int = 3) -> DataFrame:
    """(doc_id, sig array<bigint>): one base hash per shingle, n_hashes
    arithmetic permutations of it.

        b(s)   = bigint(md5(s)[0:15 hex]) mod P          (P = 2^31-1)
        sig[h] = min over shingles of ((1 + h*1000003)*b(s) + 12345 + h*7919) mod P

    The permutation family replaces the earlier md5-per-(hash, shingle)
    formula: the digest pass over the corpus — the dominant cost of dedup at
    scale — runs once instead of n_hashes times (measured ~3x on the sf0.1
    contract corpus), and the permutations are whole-stage-codegen integer
    arithmetic. Multiplier (<2^24) x base (<2^31) stays well inside bigint.
    The DuckDB oracles state the identical formula
    (('0x' || substr(md5(s),1,15))::BIGINT on that side — verified equal to
    Spark's conv(substring(md5(s),1,15),16,10)).

    Empty-shingle docs get no row and are excluded.
    """
    sh = _fan_out(docs).select(
        "doc_id", "text", word_shingles(F.col("text"), shingle_n).alias("shingles")
    ).filter(F.size("shingles") > 0)
    # hv as its own projection step: inlining the digest inside the per-h
    # lambda would re-run the md5 pass n_hashes times (Catalyst does not hoist
    # the common subexpression out of a nested transform)
    sh = sh.withColumn(
        "hv",
        F.expr(
            f"transform(shingles, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % {MINHASH_P}L)"
        ),
    )
    sig = F.expr(
        f"transform(sequence(0, {n_hashes - 1}), "
        f"h -> array_min(transform(hv, b -> ((1 + h*1000003) * b + 12345 + h*7919) % {MINHASH_P}L)))"
    )
    return sh.select("doc_id", "shingles", sig.alias("sig"))


# last auto-salt decision (observability hook for tests and operators: a
# 100 TB run discovers band skew at runtime, so the probe's verdict should be
# inspectable after the fact)
_LAST_AUTO_SALT: int | None = None


def auto_salt_for(max_band: int, cap: int, max_salt: int = 64) -> int:
    """Salt factor for the observed hottest band: 1 while every band fits the
    per-task comparison budget (cap^2 pairs), else enough salt to shrink the
    hottest band's task back under it, bounded by max_salt (right-side
    replication cost grows linearly with salt)."""
    if cap <= 0:
        raise ValueError(f"hot_band_cap must be positive, got {cap}")
    if max_band <= cap:
        return 1
    return min(max_salt, -(-max_band // cap))


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 12,
    shingle_n: int = 3,
    bands: int = 4,
    threshold: float = 0.5,
    salt: int | str = "auto",
    hot_band_cap: int = 10_000,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH, verified with exact Jaccard.

    rows-per-band r = n_hashes/bands; candidates = docs sharing any band key;
    output (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard >= threshold.

    ``salt > 1`` is the hot-band guard for skewed corpora (e.g. one boilerplate
    band shared by millions of docs): the left side of the pair join gets a
    deterministic salt ``xxhash64(doc_id) % salt`` and the right side is
    replicated to every salt value, so the candidate PAIR SET is unchanged
    (each pair meets exactly once, at the left doc's salt) but a band of size B
    fans out over `salt` tasks of ~B/salt x B instead of one B x B task. Pure
    skew mitigation — identical results (pytest-pinned), `salt`x replication
    cost on the right side.

    ``salt="auto"`` (the default) arms the guard from data, not caller
    foresight: one cheap probe over the banded ids (a map-side-combined
    groupBy().count() max on the already-checkpointed signature frame) reads
    the hottest band size and picks auto_salt_for(max_band, hot_band_cap) —
    a 100 TB corpus discovers its boilerplate skew at runtime. Pass an int to
    skip the probe (salt=1 pins the unsalted plan).
    """
    r = n_hashes // bands
    # signatures are consumed 3x (banding + both sides of the verification
    # join); shared() materializes the digest pass once — eager checkpoint by
    # default, lazy persist under REDEN_SHARED_SUBTREE=lazy (never a lazy
    # localCheckpoint, which re-executes the whole signature computation per
    # concurrent AQE consumer)
    sigs = shared(minhash_signatures(docs, n_hashes, shingle_n), arrays=True)
    banded = sigs.select(
        "doc_id",
        "shingles",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> md5(concat(cast(b as string), '#', "
                f"array_join(transform(slice(sig, b*{r}+1, {r}), x -> cast(x as string)), ','))))"
            )
        ).alias("band_key"),
    )
    # dedupe candidate PAIRS on ids only, then re-attach shingle arrays once per
    # side — shuffling/distinct-ing the full arrays through the band join is the
    # expensive anti-pattern this avoids
    left = banded.select(F.col("doc_id").alias("doc_a"), "band_key")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band_key")
    if salt == "auto":
        global _LAST_AUTO_SALT
        max_band = (
            banded.groupBy("band_key").count().agg(F.max("count").alias("m")).first()["m"]
        )
        salt = _LAST_AUTO_SALT = auto_salt_for(int(max_band or 0), hot_band_cap)
    if salt > 1:
        left = left.withColumn("s", F.pmod(F.xxhash64("doc_a"), F.lit(salt)))
        right = right.withColumn("s", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>")))
        join_keys = ["band_key", "s"]
    else:
        join_keys = ["band_key"]
    pairs = (
        left.join(right, join_keys).filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b").distinct()
    )
    sh = sigs.select("doc_id", "shingles")
    pairs = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _min_shingle_band_keys():
    """2-of-4 min-shingle band keys over the `shingles` column: block key =
    concatenated pair of two of the document's 4 smallest shingle md5s (6 keys
    per doc; single-shingle docs fall back to a self-pair key).

    Why pairs, not the single min shingle: one globally common shingle that
    happens to be the corpus-wide md5 minimum would put EVERY document in one
    block -> quadratic pair join. A pair key requires two shared min-shingles,
    so a single ubiquitous shingle creates no giant block (adversarial test in
    tests/test_extras.py). Near-dup docs at Jaccard >= 0.8 share nearly all
    shingles, so their 4-smallest sets overlap in >= 2 elements essentially
    always; the DuckDB oracle mirrors this formula exactly."""
    mins = F.slice(F.array_sort(F.expr("transform(shingles, s -> md5(s))")), 1, 4)
    n = F.size(mins)

    def m(i):
        return F.element_at(mins, i)

    def pair(i, j, need):
        return F.when(n >= need, F.concat_ws("|", m(i), m(j)))

    keys = F.array(
        F.when(n == 1, F.concat_ws("|", m(1), m(1))),
        pair(1, 2, 2),
        pair(1, 3, 3),
        pair(2, 3, 3),
        pair(1, 4, 4),
        pair(2, 4, 4),
        pair(3, 4, 4),
    )
    return F.filter(keys, lambda x: x.isNotNull())


def ngram_jaccard_pairs(docs: DataFrame, shingle_n: int = 3, threshold: float = 0.8) -> DataFrame:
    """n-gram-Jaccard near-dup pairs with exact verification, blocked on
    2-of-4 min-shingle band keys (see :func:`_min_shingle_band_keys` for the
    hot-block rationale). Candidates sharing a band key are verified with the
    exact Jaccard; recall is banding-limited like any LSH scheme, but the
    DuckDB oracle computes the identical banded formula, so parity is exact."""
    sh = (
        _fan_out(docs)
        .select("doc_id", "text", word_shingles(F.col("text"), shingle_n).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .transform(lambda d: shared(d, arrays=True))  # blocking + both join sides (see minhash note)
    )
    keyed = sh.select("doc_id", F.explode(_min_shingle_band_keys()).alias("block"))
    pairs = (
        keyed.select(F.col("doc_id").alias("doc_a"), "block")
        .join(keyed.select(F.col("doc_id").alias("doc_b"), "block"), "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    shs = sh.select("doc_id", "shingles")
    pairs = (
        pairs.join(shs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")), "doc_a")
        .join(shs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


SIMHASH_BITS = 60  # 15 md5 hex chars -> engine-portable (same digest in DuckDB)


def simhash64(docs: DataFrame, shingle_n: int = 2) -> DataFrame:
    """60-bit SimHash per document. The per-token hash is the first 15 hex chars
    of md5 (the same portable primitive as the MinHash base hash), so the whole
    computation — bit votes, shifts, bit_count — is expressible identically in
    DuckDB and the contract query has an exact SQL oracle (O_DEDUP_SIMHASH).
    Pure Column expressions; whole-stage codegen end to end."""
    sh = _fan_out(docs).select(
        "doc_id", "text", word_shingles(F.col("text"), shingle_n).alias("shingles")
    ).filter(F.size("shingles") > 0)
    tokens = sh.select("doc_id", F.explode("shingles").alias("tok")).withColumn(
        "h", F.expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)")
    )
    bits = tokens.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
        F.col("h"),
    ).withColumn("vote", F.expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END"))
    agg = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return agg.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) ELSE CAST(0 AS BIGINT) END")).alias(
            "simhash"
        )
    )


def simhash_near_pairs(docs: DataFrame, shingle_n: int = 2, max_hamming: int = 8) -> DataFrame:
    """SimHash near-dup pairs: block on equal bit-chunks, verify with
    bit_count(xor). The chunk count is DERIVED from max_hamming so the
    pigeonhole guarantee always holds: hashes within hamming distance h differ
    in at most h chunks, so with n_chunks >= h+1 the pair shares at least one
    exact chunk — recall is 1.0 within max_hamming (parity test vs a
    brute-force numpy oracle in tests/test_extras.py).

    Scale note: more chunks = narrower chunk values = coarser blocks (15
    chunks of 4 bits have only 15*16 distinct block keys). At 100 TB keep
    max_hamming <= 5 (6 chunks of 10 bits) or <= 3 (4 chunks of 15 bits);
    larger radii need combination blocking (Manku et al., WWW'07)."""
    for n_chunks in (4, 5, 6, 10, 12, 15, 20, 30):  # divisors of SIMHASH_BITS
        if n_chunks >= max_hamming + 1:
            break
    else:
        raise ValueError(f"max_hamming={max_hamming} > 29 unsupported (needs >29 chunks)")
    bits = SIMHASH_BITS // n_chunks
    mask = (1 << bits) - 1
    h = simhash64(docs, shingle_n)
    chunks = h.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("c"),
    ).withColumn("chunk_val", F.expr(f"shiftright(simhash, c * {bits}) & {mask}"))
    left = chunks.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("h_a"), "c", "chunk_val")
    right = chunks.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("h_b"), "c", "chunk_val")
    pairs = (
        left.join(right, ["c", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "h_a", "h_b")
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def duplicated_spans(docs: DataFrame, n: int = 8) -> DataFrame:
    """Exact duplicated-span detection at word grain (the ExactSubstr signal
    of Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", re-expressed relationally): flag every word n-gram OCCURRENCE
    whose gram also appears in at least one other document, and report
    per-document duplicated-span coverage: (doc_id, n_grams, n_dup_grams,
    dup_fraction). n_grams counts occurrences (not distinct grams) =
    max(n_words - n + 1, 0); dup_fraction = n_dup_grams / n_grams rounded to
    6 decimals, -1.0 sentinel for docs too short for a single n-gram.

    Scale shape: grams travel as xxhash64 longs only (never the text; the
    oracle groups by md5 of the same gram string — the result depends only on
    gram EQUALITY, so any practically-injective key matches it, and 8-byte
    JVM-native longs shuffle/sort ~5x lighter than 32-char md5 hex strings).
    One explode to (doc, gram_hash) occurrences, then a single gram-keyed
    window — min(doc_id) != max(doc_id) over the gram partition flags every
    occurrence whose gram appears in >1 document, exactly the oracle's
    doc-frequency > 1 — and one doc-grain re-aggregation where n_grams falls
    out as count(*) of the same stream (= max(n_words - n + 1, 0)). Two keyed
    shuffles on 8-byte keys, no self-join, no recomputed subtree; nothing is
    quadratic and no gram list is ever collected. (A prior draft aggregated
    (doc, gram, k) → gram-grain doc_freq → left-semi join back: that plan
    computes the 90 M-row explode+agg subtree TWICE and sort-merges it on
    string keys — measured 670 s on the 2 M-doc corpus vs 71 s for this
    shape, bench_artifacts/new_ops_scale_r5.json.)

    Known residual hazard at extreme scale: windows have no map-side combine,
    so a single gram duplicated across ~all documents (a license header, a
    boilerplate footer) clusters its occurrences into ONE window task. If a
    corpus profile shows such grams, pre-filter them with a cheap
    sample-based df cap (they are dup-by-definition; their occurrences can be
    counted map-only and added back) before the window — the same
    probe-then-mitigate pattern minhash_lsh_pairs' auto-salt uses.
    """
    # toks is projected ONCE per row before the gram lambda touches it
    # (CollapseProject keeps the boundary: toks is non-cheap and referenced
    # more than once); textually inlining the split in the gram lambda would
    # re-run the regexp+split per gram ELEMENT.
    words = "split(trim(regexp_replace(lower(coalesce(text, '')), '\\\\W+', ' ')), ' ')"
    grams = docs.select("doc_id", F.expr(words).alias("toks")).select(
        "doc_id",
        F.expr(
            f"case when size(toks) >= {n} then "
            f"transform(sequence(1, size(toks) - {n - 1}), "
            f"i -> xxhash64(array_join(slice(toks, i, {n}), ' '))) "
            "else array() end"
        ).alias("grams"),
    )
    # explode_OUTER + a post-generate null filter, not plain explode: Spark's
    # InferFiltersFromGenerate would otherwise plant a pre-Generate Filter
    # whose condition textually inlines the ENTIRE gram expression against raw
    # text — one redundant full evaluation per row (A/B: 84.7 s -> 70.9 s on
    # the 2 M-doc corpus). The null filter on the 8-byte gram is ~free.
    occ = grams.select("doc_id", F.explode_outer("grams").alias("gram")).filter(
        F.col("gram").isNotNull()
    )
    w = Window.partitionBy("gram")
    flagged = occ.select(
        "doc_id",
        (F.min("doc_id").over(w) != F.max("doc_id").over(w)).alias("is_dup"),
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_occ"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dup"),
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_occ", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.when(
            F.coalesce("n_occ", F.lit(0)) > 0,
            F.round(F.coalesce("n_dup", F.lit(0)) / F.col("n_occ"), 6),
        )
        .otherwise(F.lit(-1.0))
        .alias("dup_fraction"),
    )
