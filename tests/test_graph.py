"""Link extraction + PageRank (operators/graph.py) vs a numpy
power-iteration reference with identical dangling-mass semantics."""

import numpy as np
import pytest

from airbyte_spark.operators.graph import extract_links, pagerank


def _np_pagerank(edges, iterations, damping):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for u, _ in edges:
        out_deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        c = np.zeros(n)
        for u, v in edges:
            c[idx[v]] += r[idx[u]] / out_deg[idx[u]]
        dm = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (c + dm / n)
    return dict(zip(nodes, r))


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "c"),          # multi-edge: counts twice
    ("e", "a"), ("c", "sink"),       # "sink" has no out-links (dangling)
]


def test_pagerank_matches_numpy_reference(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["url"]: r["rank"] for r in pagerank(df, iterations=12).collect()}
    want = _np_pagerank(EDGES, 12, 0.85)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_ranks_hub_highest(spark):
    # star graph: everything links to 'hub'
    edges = [(f"n{i}", "hub") for i in range(10)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["url"]: r["rank"] for r in pagerank(df, iterations=8).collect()}
    assert got["hub"] == max(got.values())
    assert got["hub"] > 5 * got["n0"]


def test_extract_links(spark):
    html = (
        b'<html><body><a href="https://x.com/a">A</a>'
        b'<a href="/rel/path">R</a>'
        b'<a href="https://x.com/b#frag">B</a></body></html>'
    )
    df = spark.createDataFrame(
        [("https://x.com/", bytearray(html)), ("https://y.com/", bytearray(b"<p>no links</p>"))],
        "url string, html binary",
    )
    got = sorted((r["src"], r["dst"]) for r in extract_links(df).collect())
    assert got == [
        ("https://x.com/", "/rel/path"),
        ("https://x.com/", "https://x.com/a"),
        ("https://x.com/", "https://x.com/b"),  # fragment dropped
    ]


# --- anchor text -----------------------------------------------------------


def test_extract_anchors_messy_html(spark):
    from airbyte_spark.operators.graph import extract_anchors

    html = (
        '<html><body>'
        '<a href="https://a.example/x">  Plain   Link </a>'
        '<a class="btn" rel="nofollow" href="https://b.example/y#frag">Styled</a>'
        '<a name="anchor-only">no href at all</a>'
        '<a href="https://c.example/z"></a>'            # empty text: dropped
        '<a href="https://d.example/w"><b>nested</b></a>'  # nested markup: dropped
        '<a href="">empty href</a>'
        '</body></html>'
    ).encode()
    pages = spark.createDataFrame([("https://src.example/", html)], "url string, html binary")
    got = {(r["dst"], r["anchor"]) for r in extract_anchors(pages).collect()}
    assert got == {
        ("https://a.example/x", "plain link"),
        ("https://b.example/y", "styled"),
    }


def test_anchor_text_profile_counts_and_ties(spark):
    from airbyte_spark.operators.graph import anchor_text_profile

    rows = [
        ("s1", "d1", "home"),
        ("s2", "d1", "home"),
        ("s2", "d1", "start"),   # s2 links d1 twice with different anchors
        ("s3", "d1", "about"),   # 'about' ties 'start' at 1 → 'about' wins lex? no: home wins at 2
        ("s1", "d2", "b"),
        ("s2", "d2", "a"),       # tie at 1 → lexicographic: 'a'
    ]
    df = spark.createDataFrame(rows, "src string, dst string, anchor string")
    got = {r["dst"]: (r["n_links"], r["n_srcs"], r["top_anchor"], r["top_anchor_n"])
           for r in anchor_text_profile(df).collect()}
    assert got["d1"] == (4, 3, "home", 2)
    assert got["d2"] == (2, 2, "a", 1)


# --- HITS -------------------------------------------------------------------


def test_hits_matches_numpy(spark):
    import numpy as np

    from airbyte_spark.operators.graph import hits

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "b"), ("a", "b"),  # multi-edge a→b counts twice
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] += 1.0
    h = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(8):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    got = {r["url"]: (r["hub"], r["authority"]) for r in hits(df, 8).collect()}
    for u in nodes:
        assert abs(got[u][0] - h[idx[u]]) < 1e-9, u
        assert abs(got[u][1] - a[idx[u]]) < 1e-9, u


def test_hits_hub_authority_separation(spark):
    """A pure hub (links to everything, no in-links) must score hub≫auth;
    a pure sink the reverse."""
    from airbyte_spark.operators.graph import hits

    edges = [("hub", f"s{i}") for i in range(5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["url"]: r for r in hits(df, 4).collect()}
    assert got["hub"]["hub"] > 0.99 and got["hub"]["authority"] == 0.0
    assert all(got[f"s{i}"]["hub"] == 0.0 for i in range(5))
