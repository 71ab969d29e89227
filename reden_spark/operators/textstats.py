"""Text analysis operators over `documents`: language-ID, quality scoring, token
counting, document fingerprinting. All built-in-function expressions (codegen'd,
no UDFs) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword gazetteers (n-gram-heuristic stand-in; the container
# has no langid lib — deterministic and engine-portable by design)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "fr": ["le", "la", "et", "de", "un", "une", "est"],
    "es": ["el", "la", "y", "de", "un", "una", "es"],
    "de": ["der", "die", "das", "und", "ein", "ist", "zu"],
}


def tokens(col):
    return F.split(F.trim(F.regexp_replace(F.lower(col), r"\W+", " ")), " ")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy: ceil(chars/4) — the standard
    rough tokens-per-char heuristic for budgeting."""
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_words"),
        F.ceil(F.length("text") / 4).cast("int").alias("n_subwords_est"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword-ratio quality heuristics (rounded, engine-stable).

    score = 0.4*stopword_ratio + 0.3*min(n_words/100,1) + 0.3*(1-punct_ratio)
    """
    toks = tokens(F.col("text"))
    n_words = F.size(toks)
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(all_stop)))
    punct = F.length(F.regexp_replace(F.col("text"), r"[\w\s]", ""))
    stop_ratio = stop_hits.cast("double") / F.greatest(n_words, F.lit(1))
    punct_ratio = punct.cast("double") / F.greatest(F.length("text"), F.lit(1))
    len_component = F.least(n_words.cast("double") / 100.0, F.lit(1.0))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(0.4 * stop_ratio + 0.3 * len_component + 0.3 * (1.0 - punct_ratio), 6).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """argmax over per-language stopword hit counts; ties broken by language code
    ascending; 'und' when no list scores > 0."""
    toks = tokens(F.col("text"))

    def hits(ws):
        # NB: a two-arg lambda would be called as (element, index) by F.filter —
        # keep the stopword list in a real closure.
        return F.size(F.filter(toks, lambda t: t.isin(list(ws))))

    scored = docs.select(
        "doc_id",
        *[hits(ws).alias(f"hits_{lang}") for lang, ws in sorted(STOPWORDS.items())],
    )
    pairs = F.array(
        *[F.struct(F.col(f"hits_{lang}").alias("hits"), F.lit(lang).alias("lang")) for lang in sorted(STOPWORDS)]
    )
    # max by (hits asc, lang desc) -> want max hits, min lang on tie: sort by
    # (hits, reverse lang) and take last? simpler: array_max over (hits, neg-lex)…
    # deterministic: pick struct with max hits; on ties the SMALLEST lang wins.
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).alias("hits"), F.lit("zzz").alias("lang")),
        lambda acc, p: F.when(
            (p["hits"] > acc["hits"]), p
        ).otherwise(acc),
    )
    return scored.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].alias("lang_hits"),
    )


def fingerprint(docs: DataFrame, shingle_n: int = 5) -> DataFrame:
    """Document fingerprints: full-content md5 over normalized text, plus the
    winnowing-style min-shingle fingerprint (min md5 over word n-grams — the
    shingle formula is dedup.word_shingles, shared so the two modules and their
    DuckDB oracles can never drift)."""
    from .dedup import word_shingles

    return docs.select(
        "doc_id",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\W+", " "))).alias("content_md5"),
        F.array_min(F.transform(word_shingles("text", shingle_n), F.md5)).alias(
            "min_shingle_md5"
        ),
    )


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k terms by TF-IDF (doc_id, term, tf, df_docs, tfidf, rnk).

    The classic training-data-curation signal (domain keywords, boilerplate
    detection). idf = ln(N / df) with N = |documents| (no smoothing —
    engine-portable, df >= 1 by construction); score quantized to 6 decimals
    before ranking; ties broken by term ascending so the top-k set is
    deterministic in both engines.

    Scale shape: tokenize (codegen'd split, no UDF) -> one (doc_id, term)
    partial-agg shuffle for tf -> one term-grain shuffle for df (terms are
    orders of magnitude fewer than tokens after the map-side combine) ->
    broadcast df back onto tf -> per-doc window. No step materializes an
    unbounded per-doc state.
    """
    from pyspark.sql import Window

    n_docs = docs.count()  # one scalar action; the corpus size is a job input at any scale
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_docs = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    scored = tf.join(df_docs, "term").withColumn(
        "tfidf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_docs")), 6),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df_docs", "tfidf", "rnk")
    )
