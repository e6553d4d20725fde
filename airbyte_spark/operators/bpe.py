"""Byte-pair-encoding tokenizer training + encoding over the corpus.

Round 1/2 shipped a vocab-less regex token count (`textops.token_count`) and
the tokenizer-training *input* (`corpus.vocab_topk`). This module closes the
loop: learn an actual BPE merge table from the corpus and tokenize with it —
the operation a training-data pipeline runs right before sharding
(≡ sentencepiece/HF-tokenizers `train_from_iterator`, re-expressed for a
100 TB corpus on Spark).

Scale shape (the standard one, per Sennrich et al. 2016 and every production
trainer): BPE merge decisions depend only on the WEIGHTED WORD-TYPE table,
not the raw corpus. So:

  1. DISTRIBUTED: pre-tokenize + explode + groupBy word → count. This is the
     only pass over the corpus (100 TB → one map + one shuffle on word,
     partial aggregation collapses hot words map-side — same skew-proof
     shape as `vocab_topk`).
  2. Cap to the top `max_word_types` types by (count, word) — deterministic
     total order. Web-scale type tables are Zipf-distributed; the top 100k-1M
     types carry ~99.9% of token mass, and every real trainer caps here.
     The capped table (≤ a few MB) collects to the driver.
  3. DRIVER: classic merge loop over the weighted types — pure Python over
     ≤1e6 aggregated rows, independent of corpus size. Each iteration merges
     the globally most-frequent adjacent symbol pair (ties broken by pair
     lexicographic order, so training is deterministic).

Encoding is an Arrow-batched pandas UDF (the merge table broadcasts as a
closure; ranks-dict greedy merge per pre-token, GPT-2-encoder style) — no
per-row Python, no shuffle: tokenization fuses into the scan stage.

Not SQL-expressible (iterative argmax loop), so the gated query
`doc_bpe_tokens` ships without a DuckDB oracle (driver records a rows-only
check); correctness is pinned by a pure-Python reference differential in
`tests/test_bpe.py`.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, IntegerType, StringType

from airbyte_spark.operators.textops import TOKEN_PATTERN

# End-of-word sentinel: lets merges distinguish "low" in "lowest" from the
# word "low" (standard BPE). Chosen outside TOKEN_PATTERN's alphabet so it
# can never collide with a real symbol.
EOW = "▁"


def word_type_counts(
    df: DataFrame, text_col: str = "text", max_word_types: int = 100_000
) -> DataFrame:
    """Weighted word-type table: the distributed pass of BPE training.

    One scan + one shuffle on word (map-side partial agg handles Zipf skew),
    then a deterministic top-k cap by (count DESC, word ASC). The cap bounds
    driver memory no matter the corpus size."""
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("word")).limit(max_word_types)


def _pair_stats(types: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for symbols, n in types.items():
        for a, b in zip(symbols, symbols[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + n
    return stats


def _merge_types(
    types: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    ab = a + b
    out: dict[tuple[str, ...], int] = {}
    for symbols, n in types.items():
        if a not in symbols:
            out[symbols] = out.get(symbols, 0) + n
            continue
        merged: list[str] = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                merged.append(ab)
                i += 2
            else:
                merged.append(symbols[i])
                i += 1
        key = tuple(merged)
        out[key] = out.get(key, 0) + n
    return out


def learn_merges(
    weighted_types: Iterable[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a weighted word-type table (driver-side:
    input is the already-aggregated, capped type table — cost is independent
    of corpus size). Deterministic: argmax by (count, pair) with lexicographic
    tie-break; stops early when no adjacent pair repeats."""
    types: dict[tuple[str, ...], int] = {}
    for word, n in weighted_types:
        key = tuple(word) + (EOW,)
        types[key] = types.get(key, 0) + int(n)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats = _pair_stats(types)
        if not stats:
            break
        best = max(stats.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        types = _merge_types(types, best[0])
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_word_types: int = 100_000,
) -> list[tuple[str, str]]:
    """End-to-end training: distributed type counting → driver merge loop."""
    rows = word_type_counts(df, text_col, max_word_types).collect()
    return learn_merges(((r["word"], r["n"]) for r in rows), num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge of one pre-token (GPT-2 encoder shape)."""
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        pairs = list(zip(symbols, symbols[1:]))
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        _, i = min(ranked)
        symbols[i : i + 2] = [symbols[i] + symbols[i + 1]]
    return symbols


def with_bpe_tokens(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    tokens_col: str = "bpe_tokens",
    count_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge table: Arrow-batched pandas UDF, merge
    ranks broadcast in the closure, per-word memoization inside each batch
    (Zipf again: a 10k-row batch has far fewer distinct words than words).
    Fuses into the scan stage — zero shuffles."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    import re

    tok_re = re.compile(TOKEN_PATTERN)

    @F.pandas_udf(ArrayType(StringType()))
    def bpe_udf(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            out: list[str] = []
            for w in tok_re.findall((text or "").lower()):
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = encode_word(w, ranks)
                out.extend(hit)
            return out

        return texts.map(enc)

    out = df.withColumn(tokens_col, bpe_udf(F.col(text_col)))
    return out.withColumn(count_col, F.size(F.col(tokens_col)).cast("int"))


def vocab_from_merges(merges: list[tuple[str, str]], base: Iterable[str]) -> list[str]:
    """Final vocabulary = base symbols + one new symbol per merge."""
    vocab = list(dict.fromkeys(base))
    for a, b in merges:
        vocab.append(a + b)
    return vocab
