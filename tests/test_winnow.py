"""Winnowing (rolling-window min-hash) fingerprints — Schleimer et al.,
SIGMOD'03. Checks: exact agreement with a pure-Python reference
implementation on real corpus docs, the winnowing guarantee (any shared
token run of length >= w + k - 1 produces a shared fingerprint), the
density bound, and the short-document edge cases."""

from __future__ import annotations

import hashlib
import re

import pyspark.sql.functions as F

from airbyte_spark.operators.dedup_text import winnow_fingerprints

K, W = 4, 5


def ref_winnow(text: str, k: int = K, w: int = W) -> set[str]:
    ws = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
    hs = [
        hashlib.md5(" ".join(ws[i : i + k]).encode()).hexdigest()
        for i in range(len(ws) - k + 1)
    ]
    if not hs:
        return set()
    nwin = max(len(hs) - w + 1, 1)
    return {min(hs[j : j + w]) for j in range(nwin)}


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        winnow_fingerprints(df, k=K, w=W)
        .groupBy("doc_id")
        .agg(F.collect_set("fp").alias("fps"))
        .collect()
    )
    return {r["doc_id"]: set(r["fps"]) for r in out}


def test_matches_python_reference_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 40
    )
    got = (
        winnow_fingerprints(docs, k=K, w=W)
        .groupBy("doc_id")
        .agg(F.collect_set("fp").alias("fps"))
        .collect()
    )
    got_map = {r["doc_id"]: set(r["fps"]) for r in got}
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert texts, "fixture empty"
    checked = 0
    for did, text in texts.items():
        want = ref_winnow(text)
        assert got_map.get(did, set()) == want, f"doc {did} mismatch"
        checked += bool(want)
    assert checked > 0


def test_guarantee_shared_run_yields_shared_fingerprint(spark):
    # shared run of exactly w + k - 1 = 8 tokens, disjoint vocab elsewhere
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, "one two three four five six seven " + shared + " nine ten eleven"),
        (2, "uno dos tres cuatro cinco seis " + shared + " doce trece catorce"),
        (3, "red orange yellow green blue indigo violet maroon teal navy cyan"),
    ]
    fps = _fps(spark, rows)
    assert fps[1] & fps[2], "winnowing guarantee violated"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_density_and_short_docs(spark):
    long_text = " ".join(f"tok{i % 97} w{i}" for i in range(300))
    rows = [
        (1, long_text),
        (2, "a b c"),  # < k words → no k-grams → no fingerprints
        (3, "p q r s"),  # exactly k words → 1 k-gram → 1 fingerprint
        (4, ""),
        (5, None),
    ]
    fps = _fps(spark, rows)
    n_tokens = len(long_text.split())
    n_kgrams = n_tokens - K + 1
    # winnowing keeps ~2/(w+1) of k-grams; allow generous slack both ways
    assert 0 < len(fps[1]) < n_kgrams
    assert len(fps[1]) < 0.6 * n_kgrams
    assert 2 not in fps and 4 not in fps and 5 not in fps
    assert len(fps[3]) == 1
    assert fps[3] == ref_winnow("p q r s")


def test_overlap_pairs_detect_containment(spark):
    from airbyte_spark.operators.dedup_text import winnow_overlap_pairs

    quote = " ".join(f"quoted tok{i} span" for i in range(12))  # 36 tokens
    big = " ".join(f"filler w{i} body" for i in range(40)) + " " + quote
    rows = [
        (1, big),
        (2, "intro words here " + quote + " closing remarks follow now"),
        (3, " ".join(f"unrelated u{i} line" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["a_id"], r["b_id"]): r["n_shared"]
        for r in winnow_overlap_pairs(df, min_shared=2, max_df=None).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)


def test_overlap_pairs_max_df_drops_boilerplate(spark):
    from airbyte_spark.operators.dedup_text import winnow_overlap_pairs

    boiler = "all rights reserved copyright notice legal footer text here"
    rows = [(i, f"doc body d{i} x{i} y{i} z{i} " + boiler) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # boilerplate shared by all 6 docs: with max_df=3 those fps are dropped
    with_guard = winnow_overlap_pairs(df, min_shared=1, max_df=3).count()
    without = winnow_overlap_pairs(df, min_shared=1, max_df=None).count()
    assert without == 15 and with_guard == 0  # all C(6,2) pairs vs none


def test_vocab_topk_exact_counts(spark):
    from collections import Counter

    from airbyte_spark.operators.textops import vocab_topk

    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana apple! date?"),
        (3, "cherry CHERRY cherry banana"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["word"]: (r["n_occurrences"], r["n_docs"], r["rank"])
        for r in vocab_topk(df, top=3).collect()
    }
    cnt = Counter()
    docs = Counter()
    for _, t in rows:
        ws = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        cnt.update(ws)
        docs.update(set(ws))
    order = sorted(cnt, key=lambda w: (-cnt[w], w))[:3]
    assert set(got) == set(order)
    for i, wd in enumerate(order, 1):
        assert got[wd] == (cnt[wd], docs[wd], i)
