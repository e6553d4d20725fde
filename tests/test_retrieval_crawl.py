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


def test_bm25_from_postings_equals_direct(spark):
    docs = {
        1: "spark merge window spark spark",
        2: "merge merge merge table scan",
        3: "window window the quick fox",
        5: "spark",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    from airbyte_spark.operators.retrieval import (
        bm25_topk_from_postings,
        build_postings,
    )

    direct = bm25_topk(df, ["spark", "merge"], k=10).collect()
    postings = build_postings(df, id_col="doc_id")
    served = bm25_topk_from_postings(postings, ["spark", "merge"], k=10, id_col="doc_id").collect()
    key = lambda r: r["rank"]  # noqa: E731
    assert sorted((r.asDict() for r in direct), key=lambda d: d["rank"]) == sorted(
        (r.asDict() for r in served), key=lambda d: d["rank"]
    )


def test_postings_delta_equals_rebuild(spark):
    from airbyte_spark.lake.changes import CHANGE_TYPE_COL
    from airbyte_spark.operators.retrieval import apply_postings_delta, build_postings

    old = spark.createDataFrame(
        [("u1", "alpha beta beta"), ("u2", "gamma alpha"), ("u3", "delta")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        # u1 edited (one beta gone, epsilon added), u3 deleted, u4 inserted
        [("u1", "alpha beta epsilon"), ("u2", "gamma alpha"), ("u4", "zeta")],
        "url string, text string",
    )
    feed = spark.createDataFrame(
        [
            ("u1", "alpha beta beta", "update_preimage"),
            ("u1", "alpha beta epsilon", "update_postimage"),
            ("u3", "delta", "delete"),
            ("u4", "zeta", "insert"),
        ],
        f"url string, text string, {CHANGE_TYPE_COL} string",
    )
    maintained = {
        (r["term"], r["url"]): r["tf"]
        for r in apply_postings_delta(build_postings(old), feed).collect()
    }
    rebuilt = {
        (r["term"], r["url"]): r["tf"] for r in build_postings(new).collect()
    }
    assert maintained == rebuilt
    assert ("delta", "u3") not in maintained  # deleted doc fully retracted
    assert maintained[("beta", "u1")] == 1  # tf decremented, not dropped


def test_fetch_budget_hamilton_apportionment(spark):
    from airbyte_spark.operators.crawl import allocate_fetch_budget

    rows = []
    # domain a: weight 50 over 3 urls; b: weight 30 over 2; c: weight 20 over 1
    for u, p in [("a/1", 30), ("a/2", 15), ("a/3", 5)]:
        rows.append((f"https://a.example.com/{u[2:]}", p))
    for u, p in [("b/1", 20), ("b/2", 10)]:
        rows.append((f"https://b.example.com/{u[2:]}", p))
    rows.append(("https://c.example.com/1", 20))
    df = spark.createDataFrame(rows, "url string, priority long")
    # budget 4: exact shares a=2.0, b=1.2, c=0.8 → floors 2,1,0; leftover 1
    # goes to the largest remainder (c, .8) → quotas a=2, b=1, c=1
    got = allocate_fetch_budget(df, budget=4).collect()
    by_dom: dict[str, list] = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r)
    assert {d: len(v) for d, v in by_dom.items()} == {
        "a.example.com": 2, "b.example.com": 1, "c.example.com": 1,
    }
    # slots go to the highest-priority urls of each domain
    a_urls = sorted(r["url"] for r in by_dom["a.example.com"])
    assert a_urls == ["https://a.example.com/1", "https://a.example.com/2"]
    assert sum(r["quota"] for r in {r["domain"]: r for r in got}.values()) == 4


def test_fetch_budget_quota_exceeding_domain_size(spark):
    from airbyte_spark.operators.crawl import allocate_fetch_budget

    df = spark.createDataFrame(
        [("https://a.example.com/1", 99), ("https://b.example.com/1", 1)],
        "url string, priority long",
    )
    # budget 10, weights 99/1: floors 9/0, leftover slot goes to a's larger
    # remainder (90 vs 10) → quotas a=10, b=0. a has only 1 url, so the
    # selection is bounded by the domain's actual frontier — the slack is
    # visible as quota(10) > selected rows(1), per the documented contract.
    got = allocate_fetch_budget(df, budget=10).collect()
    assert len(got) == 1
    assert got[0]["domain"] == "a.example.com" and got[0]["quota"] == 10


def test_parse_sitemaps_tolerates_messy_xml(spark):
    from airbyte_spark.operators.crawl import parse_sitemaps

    xml = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url>\n  <loc>https://a.example.com/1</loc>\n  <rev>42</rev>\n</url>"
        "<url><loc>https://a.example.com/2</loc></url>"  # no rev -> 0
        "<url><rev>9</rev></url>"  # no loc -> not an entry
        "<url><loc>https://a.example.com/3</loc><rev>x</rev></url>"  # bad rev -> no match
        "</urlset>"
    )
    df = spark.createDataFrame([("a.example.com", xml)], "domain string, sitemap_xml string")
    got = {r["url"]: r["sitemap_rev"] for r in parse_sitemaps(df).collect()}
    assert got == {"https://a.example.com/1": 42, "https://a.example.com/2": 0}


def test_frontier_from_sitemap_new_updated_current(spark):
    from airbyte_spark.operators.crawl import frontier_from_sitemap

    entries = spark.createDataFrame(
        [
            ("d", "u_new", 5),      # unknown -> new
            ("d", "u_stale", 9),    # announced 9 > stored 7 -> updated
            ("d", "u_current", 7),  # announced == stored -> not seeded
            ("d", "u_older", 3),    # announced < stored -> not seeded
        ],
        "domain string, url string, sitemap_rev long",
    )
    state = spark.createDataFrame(
        [("u_stale", 7), ("u_current", 7), ("u_older", 7)],
        "url string, _ab_cdc_lsn long",
    )
    got = {r["url"]: r["reason"] for r in frontier_from_sitemap(entries, state).collect()}
    assert got == {"u_new": "new", "u_stale": "updated"}


def test_url_quality_rules_and_priority(spark):
    from airbyte_spark.functions.urls import url_quality

    cases = [
        ("https://a.com/p/1", "ok"),
        ("https://a.com/p/casino-night", "blocked_word"),
        ("https://a.com/a/b/c/d/e/f/g", "too_deep"),
        ("https://a.com/p?q=" + "z" * 100, "long_query"),
        ("https://a.com/p/123456789012345", "numeric_slug"),
        ("https://a.com/p/12345678901", "ok"),  # 11 digits < threshold
        # blocked beats deep (priority order)
        ("https://a.com/xxx/a/b/c/d/e/f/g", "blocked_word"),
        # deep beats long query
        ("https://a.com/a/b/c/d/e/f/g?q=" + "z" * 100, "too_deep"),
        ("https://a.com/", "ok"),  # root: depth 0, no last segment
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["v"]
        for r in df.select(url_quality(F.col("url")).alias("v")).collect()
    ]
    assert got == [want for _, want in cases]


def test_fetch_budget_zero_priority_falls_back_to_uniform(spark):
    from airbyte_spark.operators.crawl import allocate_fetch_budget

    # fresh corpus: every priority is 0 (single observation per url) —
    # the budget must still be spent (uniform by url count), not stall
    rows = [(f"https://a.example.com/{i}", 0) for i in range(3)] + [
        (f"https://b.example.com/{i}", 0) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "url string, priority long")
    got = allocate_fetch_budget(df, budget=4).collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r)
    assert {d: len(v) for d, v in by_dom.items()} == {
        "a.example.com": 2, "b.example.com": 2,
    }


def test_fetch_budget_normalizes_domains(spark):
    from airbyte_spark.operators.crawl import allocate_fetch_budget

    # case / default-port / query-string variants are ONE politeness unit
    rows = [
        ("https://A.example.com/1", 10),
        ("https://a.example.com:443/2", 10),
        ("https://a.example.com/3?x=1", 10),
        ("https://b.example.com/1", 30),
    ]
    df = spark.createDataFrame(rows, "url string, priority long")
    got = allocate_fetch_budget(df, budget=2).collect()
    assert {r["domain"] for r in got} == {"a.example.com", "b.example.com"}
    assert {d: q for d, q in ((r["domain"], r["quota"]) for r in got)} == {
        "a.example.com": 1, "b.example.com": 1,
    }


def test_recrawl_is_redelivery_invariant(spark):
    df1 = spark.createDataFrame(
        [("A", 0, None), ("A", 5, None), ("B", 3, None)],
        "url string, _ab_cdc_lsn long, d string",
    ).select(
        "url", "_ab_cdc_lsn",
        F.col("d").cast("timestamp_ntz").alias("_ab_cdc_deleted_at"),
    )
    # redeliver every row once (at-least-once upstream)
    df2 = df1.unionAll(df1)
    a = sorted((r.asDict() for r in recrawl_schedule(df1, top=10).collect()),
               key=lambda d: d["url"])
    b = sorted((r.asDict() for r in recrawl_schedule(df2, top=10).collect()),
               key=lambda d: d["url"])
    assert a == b


def test_url_quality_blocklist_edge_cases(spark):
    from airbyte_spark.functions.urls import url_quality

    df = spark.createDataFrame(
        [("https://a.com/casino",), ("https://a.com/ads.txt/x",)], "url string"
    )
    # empty blocklist disables the word rule entirely
    got = [r["v"] for r in df.select(url_quality(F.col("url"), blocklist=[]).alias("v")).collect()]
    assert got == ["ok", "ok"]
    # metacharacters in words are literal: 'ads.txt' must not match 'adsstxt'
    df2 = spark.createDataFrame([("https://a.com/adsstxt/x",)], "url string")
    got2 = df2.select(url_quality(F.col("url"), blocklist=["ads.txt"]).alias("v")).collect()
    assert got2[0]["v"] == "ok"
