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
