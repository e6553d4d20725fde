"""Repetition signals (operators/repetition.py) and PII scrub (textops)."""

import pyspark.sql.functions as F
import pytest

from airbyte_spark.operators.repetition import repetition_signals
from airbyte_spark.operators.textops import pii_counts, scrub_pii


def _rows(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = repetition_signals(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_repetition_uniform_doc_is_maximal(spark):
    r = _rows(spark, [(0, "spam spam spam spam spam")])
    assert r[0]["top_word_frac"] == pytest.approx(1.0)
    assert r[0]["top_bigram_frac"] == pytest.approx(1.0)
    # 3 trigram occurrences, 1 distinct → 2/3 duplicated
    assert r[0]["dup_trigram_frac"] == pytest.approx(2 / 3)
    assert r[0]["repetitive"] is True


def test_repetition_all_distinct_words(spark):
    r = _rows(spark, [(1, "alpha beta gamma delta epsilon zeta eta theta")])
    assert r[1]["top_word_frac"] == pytest.approx(1 / 8)
    assert r[1]["top_bigram_frac"] == pytest.approx(1 / 7)
    assert r[1]["dup_trigram_frac"] == pytest.approx(0.0)
    assert r[1]["repetitive"] is False


def test_repetition_short_and_empty_docs_survive(spark):
    r = _rows(spark, [(2, "word"), (3, ""), (4, "two words")])
    # one word: unigram signal only, no bigrams/trigrams to measure
    assert r[2]["top_word_frac"] == pytest.approx(1.0)
    assert r[2]["top_bigram_frac"] is None
    assert r[2]["dup_trigram_frac"] is None
    assert r[2]["repetitive"] is True  # top_word_frac 1.0 > 0.20
    # empty doc: present, all signals NULL, not repetitive
    assert r[3]["top_word_frac"] is None
    assert r[3]["repetitive"] is False
    assert r[4]["top_bigram_frac"] == pytest.approx(1.0)


def test_repetition_counts_occurrences_not_positions(spark):
    # "a b a b a" → words: a×3 b×2 (top 3/5); bigrams: "a b"×2 "b a"×2 (top 2/4)
    r = _rows(spark, [(5, "a b a b a")])
    assert r[5]["top_word_frac"] == pytest.approx(3 / 5)
    assert r[5]["top_bigram_frac"] == pytest.approx(2 / 4)
    # trigrams: "a b a"×2, "b a b"×1 → 1 - 2/3
    assert r[5]["dup_trigram_frac"] == pytest.approx(1 / 3)


def _scrub_one(spark, s):
    df = spark.createDataFrame([(s,)], "t string")
    row = df.select(
        scrub_pii(F.col("t")).alias("out"), *pii_counts(F.col("t"))
    ).first()
    return row


def test_pii_scrub_each_kind(spark):
    row = _scrub_one(
        spark, "mail bob.smith+x@corp.example.org host 192.168.0.17 tel +44-207-94600 end"
    )
    assert row["out"] == "mail <EMAIL> host <IP> tel <PHONE> end"
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (1, 1, 1)


def test_pii_scrub_idempotent_and_clean_text_untouched(spark):
    clean = "no personal data here just words 42"
    row = _scrub_one(spark, clean)
    assert row["out"] == clean
    twice = _scrub_one(spark, "a@b.com and 10.0.0.1")
    again = _scrub_one(spark, twice["out"])
    assert again["out"] == twice["out"]  # placeholders never re-match


def test_pii_scrub_rule_order(spark):
    # alpha-host email is consumed whole by the EMAIL rule; a raw-IP host
    # fails the EMAIL host grammar and its address part falls to the IP rule
    row = _scrub_one(spark, "a@b.io then u@10.11.12.13 end")
    assert row["out"] == "<EMAIL> then u@<IP> end"
    assert (row["n_emails"], row["n_ips"]) == (1, 1)


def test_pii_scrub_multiple_matches_counted(spark):
    row = _scrub_one(spark, "a@x.io b@y.io 1.2.3.4 5.6.7.8 +1-555-0000")
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (2, 2, 1)
    assert row["out"] == "<EMAIL> <EMAIL> <IP> <IP> <PHONE>"
