"""BPE tokenizer training + encoding (operators/bpe.py).

The trainer's scale shape (distributed word-type counting → driver merge
loop) must be EXACTLY equivalent to naive corpus-level BPE (count adjacent
pairs over every word occurrence in the raw corpus) when the type cap is not
hit — that equivalence is the whole reason the 100 TB path is sound, so it
is pinned by a from-first-principles reference here, not by re-running the
production code path."""

import re

import pyspark.sql.functions as F

from airbyte_spark.operators.bpe import (
    EOW,
    encode_word,
    learn_merges,
    train_bpe,
    with_bpe_tokens,
    word_type_counts,
)
from airbyte_spark.operators.textops import TOKEN_PATTERN

CORPUS = [
    (1, "the lower lowest low low low newer newest new"),
    (2, "wider widest wide wide the the the newer bidder"),
    (3, "low lower newest newest the wide bidder bid bid"),
    (4, "Bid BID low; the widest, lowest!"),
]


def _naive_corpus_bpe(rows, num_merges):
    """Independent reference: operates on raw word OCCURRENCES (no type
    aggregation, no cap) with the same determinism rule."""
    tok_re = re.compile(TOKEN_PATTERN)
    occurrences = [
        list(w) + [EOW] for _, text in rows for w in tok_re.findall(text.lower())
    ]
    merges = []
    for _ in range(num_merges):
        stats = {}
        for syms in occurrences:
            for p in zip(syms, syms[1:]):
                stats[p] = stats.get(p, 0) + 1
        if not stats:
            break
        (a, b), n = max(stats.items(), key=lambda kv: (kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        nxt = []
        for syms in occurrences:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append(out)
        occurrences = nxt
    return merges


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def test_train_matches_naive_corpus_bpe(spark):
    merges = train_bpe(_df(spark), num_merges=40, max_word_types=10_000)
    assert merges == _naive_corpus_bpe(CORPUS, 40)
    assert len(merges) > 5  # the corpus genuinely supports merges


def test_word_type_counts_exact_and_capped(spark):
    rows = {r["word"]: r["n"] for r in word_type_counts(_df(spark)).collect()}
    assert rows["the"] == 6
    assert rows["low"] == 5
    assert rows["bid"] == 4  # lowercased: bid + Bid + BID + bid
    top2 = [r["word"] for r in word_type_counts(_df(spark), max_word_types=2).collect()]
    assert top2 == ["the", "low"]  # count DESC, word ASC — deterministic cap


def test_training_is_deterministic(spark):
    a = train_bpe(_df(spark), num_merges=30)
    b = train_bpe(_df(spark), num_merges=30)
    assert a == b


def test_encode_word_is_lossless_and_monotone():
    merges = _naive_corpus_bpe(CORPUS, 40)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["lowest", "newer", "widest", "bidder", "unseen"]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW  # merges never drop or invent bytes
    # more merges → never more tokens for an in-distribution word
    few = {p: i for i, p in enumerate(merges[:5])}
    assert len(encode_word("lowest", ranks)) <= len(encode_word("lowest", few))


def test_with_bpe_tokens_matches_driver_side_encode(spark):
    merges = train_bpe(_df(spark), num_merges=40)
    ranks = {p: i for i, p in enumerate(merges)}
    tok_re = re.compile(TOKEN_PATTERN)
    got = {
        r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
        for r in with_bpe_tokens(_df(spark), merges).collect()
    }
    for doc_id, text in CORPUS:
        expect = [
            t for w in tok_re.findall(text.lower()) for t in encode_word(w, ranks)
        ]
        assert got[doc_id][0] == expect
        assert got[doc_id][1] == len(expect)


def test_encode_handles_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "low")], "doc_id bigint, text string"
    )
    merges = _naive_corpus_bpe(CORPUS, 10)
    rows = {r["doc_id"]: r["n_bpe_tokens"] for r in with_bpe_tokens(df, merges).collect()}
    assert rows[1] == 0 and rows[2] == 0 and rows[3] >= 1


def test_compression_improves_on_real_fixture(spark):
    """On the sf0.001 documents table, BPE tokens should compress the
    character stream: fewer tokens than characters, more than words."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe(docs, num_merges=100)
    out = with_bpe_tokens(docs, merges).agg(
        F.sum("n_bpe_tokens").alias("toks"),
        F.sum(F.length("text")).alias("chars"),
        F.sum(F.size(F.split("text", r"\s+"))).alias("words"),
    ).collect()[0]
    assert out["toks"] < out["chars"]
    assert out["toks"] >= out["words"]
