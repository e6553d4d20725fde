"""Unit tests for text-analysis operators (token count, quality, lang-ID,
fingerprint) — deterministic column-expression rules."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.operators.textops import (
    fingerprint,
    language_id,
    token_count,
    with_quality,
    word_count,
)


def one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).first()["v"]


@pytest.mark.parametrize(
    "text,want",
    [
        ("hello world", 2),
        ("don't stop", 4),  # don + ' + t + stop
        ("a1b 22", 5),  # a1b → a,1,b? no: [A-Za-z]+ greedy → a? 'a1b' → 'a','1','b'; '22' → '2','2'
        ("", 0),
        ("!!!", 3),
    ],
)
def test_token_count(spark, text, want):
    assert one(spark, text, token_count(F.col("text"))) == want


def test_word_count(spark):
    assert one(spark, "Hello, world! 42", word_count(F.col("text"))) == 3


@pytest.mark.parametrize(
    "text,want",
    [
        ("the cat sat on the mat and looked", "en"),
        ("der hund und die katze ist das", "de"),
        ("le chat et la souris les des", "fr"),
        ("el gato y los perros que en", "es"),
        ("il gatto di che per con", "it"),
        ("xyzzy qwerty", "und"),
        # tie between en and de markers → en wins (declared priority)
        ("the der", "en"),
    ],
)
def test_language_id(spark, text, want):
    assert one(spark, text, language_id(F.col("text"))) == want


def test_fingerprint_normalization_invariance(spark):
    variants = ["Hello,   World!", "hello world", "  HELLO--WORLD  ", "hello\tworld\n"]
    df = spark.createDataFrame([(v,) for v in variants], "text string")
    fps = {r["fp"] for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()}
    assert len(fps) == 1


def test_quality_columns(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far away today"
    bad = "!!! ??? ..."
    df = spark.createDataFrame([(1, good), (2, bad)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in with_quality(df).collect()}
    assert rows[1]["quality_score"] > rows[2]["quality_score"]
    assert rows[1]["n_words"] == 14
    assert rows[2]["punct_ratio"] > 0.5
    assert rows[1]["stopword_ratio"] > 0.1


def test_tfidf_topk_matches_python_reference(spark):
    import re
    from collections import Counter

    from airbyte_spark.operators.textops import tfidf_topk

    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry date"),
        (3, "apple apple apple zebra"),
        (4, "date elderberry fig zebra zebra"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
        for r in tfidf_topk(df, k=2).collect()
    }

    tf = {i: Counter(re.findall(r"[a-z]+", t.lower())) for i, t in rows}
    dfreq = Counter(term for c in tf.values() for term in c)
    n = len(rows)
    for i, c in tf.items():
        scored = sorted(
            ((cnt * n / dfreq[t], t) for t, cnt in c.items()),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        for rank, (s, t) in enumerate(scored, 1):
            assert got[(i, rank)] == (t, s), (i, rank, got[(i, rank)], (t, s))


def test_tfidf_rare_term_beats_common(spark):
    from airbyte_spark.operators.textops import tfidf_topk

    marker = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    rows = [(i, "common words everywhere " + marker[i]) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    top1 = {
        r["doc_id"]: r["term"]
        for r in tfidf_topk(df, k=1).collect()
    }
    assert top1 == {i: marker[i] for i in range(6)}


def test_lm_surprisal_matches_python_reference(spark):
    import re
    from collections import Counter

    from airbyte_spark.operators.textops import lm_surprisal

    rows = [
        (1, "the the the the cat"),
        (2, "the cat sat on a rare xylophone"),
        (3, "zzz qqq www"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in lm_surprisal(df).collect()}

    toks = {i: re.findall(r"[a-z]+", t.lower()) for i, t in rows}
    counts = Counter(w for ws in toks.values() for w in ws)
    n_total = sum(counts.values())
    bits_n = n_total.bit_length()
    for i, ws in toks.items():
        n = len(ws)
        bits = sum(bits_n - counts[w].bit_length() for w in ws)
        assert got[i]["n_tokens"] == n
        assert got[i]["surprisal_bits"] == bits
        if n:
            assert got[i]["bits_per_token"] == bits / n
        else:
            assert got[i]["bits_per_token"] is None


def test_lm_surprisal_orders_rare_above_common(spark):
    from airbyte_spark.operators.textops import lm_surprisal

    # doc 1 is pure repeated common tokens; doc 2 is all-singleton tokens.
    rows = [(1, "the " * 50), (2, "unique tokens appear once each time")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    bpt = {r["doc_id"]: r["bits_per_token"] for r in lm_surprisal(df).collect()}
    assert bpt[2] > bpt[1]
