"""Text-analysis operators for a large-scale training-data pipeline.

These extend the engine beyond the reference's CDC surface (the reference
has no text analytics) with the operations a web-text ingest needs at
100 TB: token counting, quality scoring, language ID, fingerprinting.

All are pure column expressions (JVM-side, whole-stage codegen — no Python
in the hot path) and are oracle-checkable: every rule is expressible in
ANSI-ish SQL (see __spark_entry__.oracle_sql). At scale they run as a map
stage fused into the scan (no shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# BPE-ish tokenization: letter runs, single digits, single punctuation marks —
# the shape of byte-pair pretokenizers (letters vs digits vs symbols), without
# a vocab. Same regex runs in DuckDB (RE2) and Spark (Java regex).
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

PUNCT_PATTERN = r"[^\w\s]"

# Stopword markers per language for the n-gram/stopword-count language ID.
# Order is the deterministic tie-break priority.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "to"]),
    ("de", ["der", "die", "und", "ist", "das"]),
    ("fr", ["le", "la", "et", "les", "des"]),
    ("es", ["el", "los", "y", "que", "en"]),
    ("it", ["il", "di", "che", "per", "con"]),
]

STOPWORDS_EN = ["the", "a", "an", "of", "and", "to", "in", "is", "that", "it"]


def token_count(text: Column) -> Column:
    """Whitespace-free BPE-ish token count (vectorized regex, no UDF)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def word_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+"), 0))


def _count_matches(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def _marker_count(text_lower: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text_lower, F.lit(pat), 0))


def language_id(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword-marker counts,
    deterministic tie-break by LANG_MARKERS order; 'und' when all zero."""
    lower = F.lower(text)
    scores = [(_marker_count(lower, ws), lang) for lang, ws in LANG_MARKERS]
    best = F.greatest(*[s for s, _ in scores])
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for score, lang in reversed(scores):
        expr = F.when((best > 0) & (score == best), F.lit(lang)).otherwise(expr)
    return expr


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-signal columns: sizes, ratios, and a composite keep-score in
    [0,1] (mirrors the shape of C4/Gopher-style quality filters)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = word_count(t)
    n_punct = _count_matches(t, PUNCT_PATTERN)
    n_stop = _marker_count(F.lower(t), STOPWORDS_EN)
    mean_word_len = F.when(n_words > 0, n_chars.cast("double") / n_words)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(0.0)
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), F.lit(0.4)).otherwise(0.0)
        + F.when((mean_word_len >= 2) & (mean_word_len <= 12), F.lit(0.2)).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, F.lit(0.2)).otherwise(0.0)
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("n_tokens", token_count(t))
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


# PII patterns, deliberately restricted to syntax shared by Java regex
# (Spark codegen) and RE2 (DuckDB oracle): char classes, bounded repeats,
# non-capturing groups, \b — no lookaround, no backreferences.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_PATTERN = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,6}"

_PII_RULES: list[tuple[str, str]] = [
    # order matters: emails contain dotted hosts that the IP/number rules
    # must never see, so the email rule runs first
    (EMAIL_PATTERN, "<EMAIL>"),
    (IPV4_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
]


def scrub_pii(text: Column) -> Column:
    """Redact emails / IPv4 addresses / international-format phone numbers
    with typed placeholders. Pure vectorized regexp_replace chain (JVM-side,
    fused into the scan — zero shuffles, no UDF); idempotent, since no
    placeholder matches any PII pattern."""
    out = text
    for pat, tag in _PII_RULES:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(text: Column) -> list[Column]:
    """Per-kind redaction counters (audit trail for the scrub): how many
    emails / IPs / phones the document carried. Counted on the SAME rule
    order the scrub applies, so counts always equal placeholders inserted."""
    remaining = text
    out = []
    for (pat, tag), name in zip(_PII_RULES, ["n_emails", "n_ips", "n_phones"]):
        out.append(F.size(F.regexp_extract_all(remaining, F.lit(pat), 0)).alias(name))
        remaining = F.regexp_replace(remaining, pat, tag)
    return out


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, non-alnum runs → one
    space, trimmed. One rule, pinned here (byte-identity discipline)."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. Whitespace/markup
    variations collapse to the same fingerprint."""
    return F.md5(normalize_text(text))


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 100,
) -> DataFrame:
    """Corpus vocabulary: the top-k most frequent words with counts and
    document frequency — the vocabulary-building / stopword-discovery
    primitive of a training-data pipeline (and the input to tokenizer
    training).

    Scale shape: explode → ONE groupBy shuffle with map-side partial
    aggregation (word cardinality ≪ token count, so combiners collapse
    almost everything before the exchange); the global top-k is a
    WindowGroupLimit over the already-aggregated vocabulary, never over
    raw tokens. Ties break lexicographically so results are deterministic
    and oracle-reproducible.
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
            )
        ).alias("word"),
    )
    agg = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct(F.col("_doc")).alias("n_docs"),
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k keywords per document by tf-idf — the lightweight relevance
    signal corpus curation uses for topic tagging / routing.

    idf is the RATIONAL variant N/df(t) (not log(N/df)): within one
    document it is a monotone transform of the standard weight, so the
    top-k set is similar, and it keeps every value an exact IEEE-double
    product of integer counts — bit-identical across engines, which makes
    the operator oracle-checkable (log() implementations may differ in the
    last ulp between libms).

    Scale shape: explode → per-(doc, term) count (one shuffle, map-side
    combinable), term document frequency (one agg on term — Zipf-skew-proof
    for the same reason), join back on term, then a per-doc top-k window.
    Ties break by term ascending: fully deterministic output.
    """
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z]+"), 0)
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(id_col).distinct().count()
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        (F.col("tf").cast("double") * F.lit(float(n_docs)) / F.col("df").cast("double")).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def lm_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality score: train a unigram LM on the
    corpus in one aggregate, score every document by its cross-entropy
    under that LM. Low bits/token = repetitive/templated text, high =
    rare-token gibberish — CCNet buckets the corpus by exactly this
    statistic (head/middle/tail) before training-data selection.

    Surprisal is QUANTIZED TO WHOLE BITS via integer bit-length:
    bits(w) = bitlen(N) - bitlen(c(w)) ≈ floor-ish log2(N / c(w)), with
    bitlen(x) = length(bin(x)) computed exactly on BIGINT in both Spark and
    DuckDB. No ln()/log2() calls — transcendental libm results can differ
    in the last ulp between engines, which would break the value-hash
    oracle; integer bit arithmetic is bit-identical everywhere, and
    bits_per_token stays an exact IEEE quotient of two integers.

    Scale shape (100 TB): per-(doc, term) counts first (one shuffle,
    map-side combinable — Zipf skew collapses at the combiner), the global
    term table is another map-side-combinable agg, and the scoring join is
    on distinct (doc, term) pairs, not raw tokens. N is a scalar. No
    step touches raw token volume after the first combine.
    """
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z]+"), 0)
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    n_total = counts.agg(F.sum("c")).first()[0] or 0
    bits_n = F.lit(int(n_total).bit_length()).cast("bigint")

    def _bitlen(col: Column) -> Column:
        return F.length(F.bin(col.cast("bigint"))).cast("bigint")

    scored = tf.join(counts, "term").groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(F.col("tf") * (bits_n - _bitlen(F.col("c")))).alias("surprisal_bits"),
    )
    return df.select(id_col).distinct().join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("surprisal_bits"), F.lit(0)).cast("bigint").alias("surprisal_bits"),
        F.when(
            F.col("n_tokens") > 0,
            F.col("surprisal_bits").cast("double") / F.col("n_tokens").cast("double"),
        ).alias("bits_per_token"),
    )
