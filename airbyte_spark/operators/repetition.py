"""Repetition-based quality signals (Gopher-style repetition filters).

A training-data pipeline drops documents whose content is dominated by
repeated fragments (boilerplate, keyword stuffing, templated spam). The
classic signals (Gopher / MassiveText, Rae et al. 2021, table A1) are the
fraction of the document taken by its most frequent word / 2-gram and the
fraction of duplicated 3-grams. The reference has no text analytics; this
extends the corpus-curation suite alongside operators/textops.py.

Scale shape (100 TB):
  - one explode of stacked (n, gram) tuples fused into the document scan
    (the three gram sizes ride ONE pass over the words array — the text is
    read and tokenized once, not three times);
  - one shuffle keyed (doc_id, n, gram) with map-side partial counts —
    repeated grams collapse before the exchange, so a pathologically
    repetitive document (the thing this operator exists to catch) shuffles
    FEWER rows, not more;
  - per-doc rollup + final assembly shuffle on doc_id only (tiny rows).
All column expressions are built-in (codegen); no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from airbyte_spark.operators.dedup_text import _spread, words

# Gopher-shaped rejection thresholds (fractions of gram occurrences).
TOP_WORD_MAX = 0.20
TOP_BIGRAM_MAX = 0.18
DUP_TRIGRAM_MAX = 0.30


def _ngrams(ws: Column, n: int) -> Column:
    """Word n-gram array WITH duplicates; empty for docs shorter than n
    (same short-doc branching as dedup_text.shingles — sequence() counting
    down would abort under ANSI mode)."""
    if n == 1:
        return ws
    cnt = F.size(ws) - (n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition profile:

      top_word_frac     — occurrences of the most frequent word / all words
      top_bigram_frac   — same for word 2-grams
      dup_trigram_frac  — 1 - distinct 3-grams / total 3-grams
      repetitive        — any signal past its Gopher-shaped threshold

    A doc with no grams of size n has NULL for that signal (nothing to
    measure ≠ measured clean); `repetitive` treats NULL signals as false.
    Every input doc_id appears in the output exactly once.
    """
    base = _spread(df).select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("ws")
    )

    def tag(n: int):
        # unary on purpose: a binary lambda would make F.transform pass the
        # array INDEX as the second argument, clobbering a default-arg n
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    stacked = base.select(
        "doc_id",
        F.explode(
            F.flatten(
                F.array(
                    *[F.transform(_ngrams(F.col("ws"), n), tag(n)) for n in (1, 2, 3)]
                )
            )
        ).alias("t"),
    ).select("doc_id", F.col("t.n").alias("n"), F.col("t.g").alias("g"))

    counts = stacked.groupBy("doc_id", "n", "g").agg(F.count(F.lit(1)).alias("c"))
    per_n = counts.groupBy("doc_id", "n").agg(
        F.max("c").alias("top"),
        F.sum("c").alias("tot"),
        F.count(F.lit(1)).alias("nd"),
    )
    frac = F.col("top").cast("double") / F.col("tot").cast("double")
    dup = F.lit(1.0) - F.col("nd").cast("double") / F.col("tot").cast("double")
    sig = per_n.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 1, frac)).alias("top_word_frac"),
        F.max(F.when(F.col("n") == 2, frac)).alias("top_bigram_frac"),
        F.max(F.when(F.col("n") == 3, dup)).alias("dup_trigram_frac"),
    )
    repetitive = (
        F.coalesce(F.col("top_word_frac") > TOP_WORD_MAX, F.lit(False))
        | F.coalesce(F.col("top_bigram_frac") > TOP_BIGRAM_MAX, F.lit(False))
        | F.coalesce(F.col("dup_trigram_frac") > DUP_TRIGRAM_MAX, F.lit(False))
    )
    # left join keeps zero-word docs (explode drops them): all-NULL signals
    return (
        base.select("doc_id")
        .join(sig, "doc_id", "left")
        .select(
            "doc_id",
            "top_word_frac",
            "top_bigram_frac",
            "dup_trigram_frac",
            repetitive.alias("repetitive"),
        )
    )
