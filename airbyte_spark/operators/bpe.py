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


def learn_merges(
    weighted_types: Iterable[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a weighted word-type table (driver-side:
    input is the already-aggregated, capped type table — cost is independent
    of corpus size). Deterministic: argmax by (count, pair) with lexicographic
    tie-break; stops early when no adjacent pair repeats.

    Incremental bookkeeping (the optimization every real trainer uses):
    pair counts and a pair→containing-types index are maintained as diffs —
    each merge touches only the types that contain the merged pair, so a
    32k-merge vocabulary over a 1M-type table is minutes, not hours. Results
    are bit-identical to full recomputation (tests pin this via the naive
    corpus-level reference)."""
    types: list[list] = []  # [symbols, count]
    agg: dict[tuple[str, ...], int] = {}
    for word, n in weighted_types:
        key = tuple(word) + (EOW,)
        agg[key] = agg.get(key, 0) + int(n)
    for key, n in agg.items():
        types.append([list(key), n])

    stats: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, n) in enumerate(types):
        for p in zip(syms, syms[1:]):
            stats[p] = stats.get(p, 0) + n
            where.setdefault(p, set()).add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not stats:
            break
        best, best_n = max(stats.items(), key=lambda kv: (kv[1], kv[0]))
        if best_n < 2:
            break
        merges.append(best)
        a, b = best
        for idx in sorted(where.get(best, ())):
            syms, n = types[idx]
            old_c: dict[tuple[str, str], int] = {}
            for p in zip(syms, syms[1:]):
                old_c[p] = old_c.get(p, 0) + 1
            merged: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            types[idx][0] = merged
            new_c: dict[tuple[str, str], int] = {}
            for p in zip(merged, merged[1:]):
                new_c[p] = new_c.get(p, 0) + 1
            for p in old_c.keys() | new_c.keys():
                d = new_c.get(p, 0) - old_c.get(p, 0)
                if d:
                    v = stats.get(p, 0) + d * n
                    if v > 0:
                        stats[p] = v
                    else:
                        stats.pop(p, None)
                if new_c.get(p, 0):
                    where.setdefault(p, set()).add(idx)
                else:
                    s = where.get(p)
                    if s is not None:
                        s.discard(idx)  # never drop the whole set: other
                        # types' membership must survive transient zeros
        stats.pop(best, None)
        where.pop(best, None)
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
