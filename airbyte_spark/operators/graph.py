"""Web-graph operators: link extraction and PageRank.

Common-Crawl-scale corpora carry their own quality signal in the link
graph (Page et al. 1999; CC releases host/domain rank files computed
exactly this way). This module extracts the edge list from crawled HTML
and runs power-iteration PageRank as join/agg rounds — the standard Spark
shape (what GraphX/GraphFrames compile to; no extra jars needed).

Scale shape (100 TB): edge extraction is a scan-fused column regex (zero
shuffles, no UDF); each PageRank round is edges⋈ranks + one sum-aggregate
keyed on the destination — two shuffles over the EDGE list, map-side
partial sums absorb hub skew (a page linked by millions of others is a
single hot reduce key whose addends combine per map task). Rounds are
localCheckpoint()ed so lineage stays O(1) in the iteration count (swap
for a reliable checkpoint dir on a real cluster).

Not SQL-expressible (iterative fixpoint), so the gated query ships
rows-only; tests/test_graph.py pins the values against a numpy
power-iteration reference with identical dangling-mass handling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

HREF_PATTERN = r'href="([^"#]+)'


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst) edge list from raw page bytes: vectorized regex over the
    decoded HTML, fused into the scan. Fragments are dropped; relative
    hrefs are kept as-is (resolution is a follow-on projection when the
    crawl needs it)."""
    hrefs = F.regexp_extract_all(
        F.decode(F.col(html_col), "UTF-8"), F.lit(HREF_PATTERN), 1
    )
    return pages.select(
        F.col(url_col).alias("src"), F.explode(hrefs).alias("dst")
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over an edge list. Multi-edges contribute
    multiply (weight = link count); dangling mass (pages with no
    out-links) is redistributed uniformly each round, so ranks always sum
    to 1. Returns (url, rank)."""
    nodes = (
        edges.select(F.col(src_col).alias("url"))
        .unionAll(edges.select(F.col(dst_col).alias("url")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = edges.groupBy(F.col(src_col).alias("u")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .join(out_deg, "u")
        .localCheckpoint(eager=True)  # degree join runs once, not per round
    )
    ranks = nodes.select("url", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["u"] == ranks["url"])
            .groupBy("v")
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("c"))
        )
        # dangling mass stays IN-PLAN: a 1-row aggregate broadcast into the
        # update expression — no per-round driver collect
        dangling = (
            ranks.join(out_deg, ranks["url"] == out_deg["u"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, nodes["url"] == contrib["v"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "url",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("_dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


# --- anchor text -----------------------------------------------------------

# full <a> tag with an unbroken text child: group 1 = href, group 2 = text.
# Nested markup inside the anchor ([^<]*) is deliberately excluded — the
# truncated-at-tag form matches what link-corpus builds keep (plain-text
# anchors), and keeps the regex linear-time on adversarial pages.
ANCHOR_TAG_PATTERN = r'<a\s[^>]*href="([^"]+)"[^>]*>([^<]*)</a>'


def extract_anchors(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(src, dst, anchor) triples from raw page bytes — the anchor-text
    corpus step of web-scale indexing/training pipelines (anchor text is a
    query-independent description of the TARGET page; Common Crawl link
    releases and classic IR both aggregate it per destination).

    Vectorized and scan-fused: one regexp_extract_all for whole <a> tags,
    explode, then per-snippet group extraction — zero shuffles, no UDF.
    Fragments are stripped from the destination (same rule as
    HREF_PATTERN); empty anchor text and empty hrefs are dropped."""
    snippets = F.regexp_extract_all(
        F.decode(F.col(html_col), "UTF-8"), F.lit(ANCHOR_TAG_PATTERN), 0
    )
    # keep_cols pass through per anchor row (e.g. the change-feed type
    # column, so signed delta maintenance can explode images in place)
    one = pages.select(
        F.col(url_col).alias("src"), *keep_cols, F.explode(snippets).alias("_tag")
    )
    dst = F.regexp_replace(
        F.regexp_extract(F.col("_tag"), ANCHOR_TAG_PATTERN, 1), "#.*$", ""
    )
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_extract(F.col("_tag"), ANCHOR_TAG_PATTERN, 2), r"\s+", " "
        )
    )
    return (
        one.select("src", *keep_cols, dst.alias("dst"), F.lower(anchor).alias("anchor"))
        .filter((F.col("dst") != "") & (F.col("anchor") != ""))
    )


def anchor_text_profile(anchors: DataFrame) -> DataFrame:
    """Per-destination anchor profile: in-link count, distinct linking
    pages, and the most frequent normalized anchor string (ties broken
    lexicographically so the result is replay-deterministic).

    Scale shape (100 TB): two-level aggregate — (dst, anchor) partial
    counts absorb hot targets' skew map-side, then one window per dst over
    the already-collapsed profile rows (O(distinct anchors), not O(links)).
    No joins, no driver collect."""
    from pyspark.sql import Window

    per_anchor = anchors.groupBy("dst", "anchor").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("dst").orderBy(F.col("n").desc(), F.col("anchor").asc())
    top = (
        per_anchor.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("dst", F.col("anchor").alias("top_anchor"), F.col("n").alias("top_anchor_n"))
    )
    totals = anchors.groupBy("dst").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("src").alias("n_srcs"),
    )
    return totals.join(top, "dst")


def hits(
    edges: DataFrame,
    iterations: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Kleinberg's HITS (hubs & authorities, JACM 1999) over an edge list:
    authority(v) ← Σ hub(u) over in-links, hub(u) ← Σ authority(v) over
    out-links, renormalized each half-step. Multi-edges contribute
    multiply. Normalization is L1 (scores sum to 1) instead of the
    classical L2 — a positive scalar either way, so rankings are
    identical, and avoiding sqrt keeps the unrolled SQL oracle exact.

    Scale shape mirrors pagerank(): each half-step is one edges⋈scores
    join + one sum-aggregate keyed on the opposite endpoint — two
    shuffles over the EDGE list with map-side partial sums absorbing hub
    skew; the normalizer is a 1-row aggregate broadcast into the update
    (no driver collect). Rounds are localCheckpoint()ed so lineage stays
    O(1) in the iteration count. Returns (url, hub, authority)."""
    e = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("u").alias("url"))
        .unionAll(e.select(F.col("v").alias("url")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    hub = nodes.select("url", F.lit(1.0 / n).alias("s"))

    def half_step(scores: DataFrame, from_col: str, to_col: str) -> DataFrame:
        raw = (
            e.join(scores, e[from_col] == scores["url"])
            .groupBy(to_col)
            .agg(F.sum("s").alias("x"))
        )
        total = raw.agg(F.sum("x").alias("_t"))
        return (
            nodes.join(raw, nodes["url"] == raw[to_col], "left")
            .crossJoin(F.broadcast(total))
            .select("url", (F.coalesce(F.col("x"), F.lit(0.0)) / F.col("_t")).alias("s"))
            .localCheckpoint(eager=True)
        )

    auth = None
    for _ in range(iterations):
        auth = half_step(hub, "u", "v")
        hub = half_step(auth, "v", "u")
    return (
        hub.withColumnRenamed("s", "hub")
        .join(auth.withColumnRenamed("s", "authority"), "url")
    )
