"""BM25 retrieval, recrawl scheduling, and histogram-quantile sketches.

Each operator is checked against an independent pure-Python restatement of
its math on tiny hand-built inputs (the sf-dir oracle parity is covered by
scripts/check_oracle.py / the driver gate; here we pin semantics)."""

from __future__ import annotations

import math
import re

import pyspark.sql.functions as F

from airbyte_spark.operators.crawl import recrawl_schedule
from airbyte_spark.operators.retrieval import bm25_topk
from airbyte_spark.operators.sketches import merged_quantiles, segment_histograms


def _py_bm25(docs: dict[int, str], terms: list[str], scale=1_000_000.0):
    tok = {d: re.findall(r"[a-z]+", t.lower()) for d, t in docs.items()}
    tok = {d: ws for d, ws in tok.items() if ws}
    n = len(tok)
    avgdl = sum(len(w) for w in tok.values()) / n
    df = {
        q: sum(1 for ws in tok.values() if q in ws)
        for q in set(terms)
    }
    out = {}
    for d, ws in tok.items():
        s, hit = 0, 0
        for q in sorted(set(terms)):
            tf = ws.count(q)
            if not tf:
                continue
            hit += 1
            idf = (float(n) - float(df[q]) + 0.5) / (float(df[q]) + 0.5)
            tfc = (float(tf) * 2.25) / (
                float(tf) + 1.25 * (0.25 + 0.75 * (float(len(ws)) / avgdl))
            )
            s += math.floor(scale * (idf * tfc))
        if hit:
            out[d] = (hit, s)
    return out


def test_bm25_matches_python_restatement(spark):
    docs = {
        1: "spark merge window spark spark",
        2: "merge merge merge table scan",
        3: "window window the quick fox",
        4: "nothing relevant here at all",
        5: "spark",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"], r["rank"])
        for r in bm25_topk(df, ["spark", "merge", "window"], k=10).collect()
    }
    want = _py_bm25(docs, ["spark", "merge", "window"])
    assert set(got) == set(want)  # doc 4 matched nothing
    for d, (hit, score) in want.items():
        assert got[d][0] == hit and got[d][1] == score, d
    # ranks are dense 1..n ordered by score desc
    by_rank = sorted(got.values(), key=lambda t: t[2])
    assert [t[2] for t in by_rank] == list(range(1, len(got) + 1))
    assert all(a[1] >= b[1] for a, b in zip(by_rank, by_rank[1:]))


def test_bm25_k_truncates_deterministically(spark):
    df = spark.createDataFrame(
        [(i, "spark common text") for i in range(10)], "doc_id long, text string"
    )
    top = bm25_topk(df, ["spark"], k=3).collect()
    # identical scores → doc_id ascending tiebreak
    assert [r["doc_id"] for r in sorted(top, key=lambda r: r["rank"])] == [0, 1, 2]


def test_recrawl_prioritizes_fast_changing_stale_urls(spark):
    rows = []
    # url A: changes every position 0..4 then silent (rate 1e6 ppm, staleness 15)
    for i in range(5):
        rows.append(("A", i, None))
    # url B: two observations far apart, recent (low rate, low staleness)
    rows.append(("B", 0, None))
    rows.append(("B", 19, None))
    # url C: deleted at the end — excluded
    rows.append(("C", 3, None))
    rows.append(("C", 18, "2024-01-01 00:00:00"))
    # url D: single observation — no interval evidence, rate 0
    rows.append(("D", 10, None))
    df = spark.createDataFrame(rows, "url string, _ab_cdc_lsn long, d string").select(
        "url",
        "_ab_cdc_lsn",
        F.col("d").cast("timestamp_ntz").alias("_ab_cdc_deleted_at"),
    )
    got = {r["url"]: r.asDict() for r in recrawl_schedule(df, top=10).collect()}
    assert "C" not in got  # tombstoned by its last event
    assert got["A"]["rate_ppm"] == 1_000_000 and got["A"]["staleness"] == 15
    assert got["A"]["priority"] == 15_000_000
    assert got["B"]["rate_ppm"] == 1_000_000 // 19
    assert got["D"]["rate_ppm"] == 0 and got["D"]["priority"] == 0
    assert got["A"]["rank"] == 1  # fast + stale wins the frontier


def test_histogram_quantiles_merge_exactly(spark):
    # values 0..99 in two segments split arbitrarily; width 10
    rows = [(i % 2, i) for i in range(100)]
    df = spark.createDataFrame(rows, "checkpoint_id long, v long")
    h = segment_histograms(df, "v", bucket_width=10)
    # per-segment histograms are disjoint-supported here? No — both segments
    # hit every bucket; merged counts must equal the global histogram.
    merged = {r["bucket"]: r["n"] for r in h.groupBy("bucket").agg(F.sum("n").alias("n")).collect()}
    assert merged == {b: 10 for b in range(10)}
    qs = merged_quantiles(h, [0.5, 0.9, 0.99], bucket_width=10).collect()
    got = {round(r["q"], 2): (r["estimate"], r["n_rows"]) for r in qs}
    # ceil(.5*100)=50 → bucket 4 (cum 50) → upper bound 49
    assert got[0.5] == (49, 100)
    # ceil(.9*100)=90 → bucket 8 → 89 ; ceil(.99*100)=99 → bucket 9 → 99
    assert got[0.9] == (89, 100)
    assert got[0.99] == (99, 100)


def test_histogram_is_partitioning_independent(spark):
    rows = [(i % 3, (i * 7) % 50) for i in range(200)]
    a = spark.createDataFrame(rows, "checkpoint_id long, v long")
    b = a.repartition(7)
    qa = merged_quantiles(segment_histograms(a, "v", bucket_width=8), [0.5], 8).collect()
    qb = merged_quantiles(segment_histograms(b, "v", bucket_width=8), [0.5], 8).collect()
    assert [r.asDict() for r in qa] == [r.asDict() for r in qb]
