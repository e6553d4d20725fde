"""Row-level change feed (lake/changes.py) + incremental materialized view
(operators/matview.py).

The load-bearing invariants:
- row_changes classifies insert/update/delete exactly (vs a snapshot diff
  computed naively from full reads of both versions),
- carried-over rows from copy-on-write rewrites never surface as changes,
- an aggregate view maintained ONLY from the change feed equals a full
  recompute over the final snapshot — including through soft-delete
  tombstones (visibility pre-filter) and physical tombstone expiry.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.changes import CHANGE_TYPE_COL, row_changes
from airbyte_spark.operators.matview import apply_agg_delta, build_agg
from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.streaming.pipeline import CdcPipeline


@pytest.fixture(scope="module")
def phased(spark, sf_dir, tmp_path_factory):
    """Replay the changelog in two phases, recording the mid version."""
    path = str(tmp_path_factory.mktemp("cdf") / "pages")
    pipe = CdcPipeline.create_target(spark, path, n_buckets=4)
    ch = read_changelog(spark, sf_dir)
    ckpts = sorted(r[0] for r in ch.select("checkpoint_id").distinct().collect())
    cut = ckpts[: max(1, len(ckpts) // 2)]
    pipe.replay(ch.filter(F.col("checkpoint_id").isin(cut)))
    v_mid = pipe.table.current_version()
    pipe.replay(ch)
    v_end = pipe.table.current_version()
    return pipe, v_mid, v_end


def _snapshot(pipe, version):
    return {
        r["url"]: (r["warc_ts"], r["_ab_cdc_lsn"], r["_ab_cdc_deleted_at"])
        for r in pipe.table.read(version).collect()
    }


def test_row_changes_match_naive_snapshot_diff(phased):
    pipe, v_mid, v_end = phased
    old, new = _snapshot(pipe, v_mid), _snapshot(pipe, v_end)
    want_ins = {u for u in new if u not in old}
    want_del = {u for u in old if u not in new}
    want_upd = {u for u in old if u in new and old[u] != new[u]}

    rows = row_changes(pipe.table, v_mid, v_end).collect()
    by_type: dict[str, set] = {}
    for r in rows:
        by_type.setdefault(r[CHANGE_TYPE_COL], set()).add(r["url"])
    assert by_type.get("insert", set()) == want_ins
    assert by_type.get("delete", set()) == want_del
    assert by_type.get("update_preimage", set()) == want_upd
    assert by_type.get("update_postimage", set()) == want_upd
    # pre/post images carry the old/new values respectively
    pre = {r["url"]: r["_ab_cdc_lsn"] for r in rows if r[CHANGE_TYPE_COL] == "update_preimage"}
    post = {r["url"]: r["_ab_cdc_lsn"] for r in rows if r[CHANGE_TYPE_COL] == "update_postimage"}
    for u in want_upd:
        assert pre[u] == old[u][1] and post[u] == new[u][1]


def test_carried_over_rows_are_not_changes(phased):
    """CoW merges rewrite whole bucket files; unchanged keys inside them
    must not appear in the feed."""
    pipe, v_mid, v_end = phased
    old, new = _snapshot(pipe, v_mid), _snapshot(pipe, v_end)
    unchanged = {u for u in old if u in new and old[u] == new[u]}
    assert unchanged, "fixture should carry over at least one row"
    feed_urls = {r["url"] for r in row_changes(pipe.table, v_mid, v_end).collect()}
    assert not (unchanged & feed_urls)


def test_empty_diff_yields_no_changes(phased):
    pipe, _, v_end = phased
    assert row_changes(pipe.table, v_end, v_end).count() == 0


def test_changes_from_zero_are_all_inserts(phased):
    pipe, _, v_end = phased
    rows = row_changes(pipe.table, 0, v_end).collect()
    assert rows and all(r[CHANGE_TYPE_COL] == "insert" for r in rows)
    assert len(rows) == pipe.table.read(v_end).count()


MEASURES = {"n_pages": None}


def _measures():
    return {"n_pages": None, "n_chars": F.length(F.col("text"))}


def _visible(df):
    return df.filter(F.col("_ab_cdc_deleted_at").isNull())


def test_matview_incremental_equals_recompute(phased, spark):
    pipe, v_mid, v_end = phased
    state = build_agg(_visible(pipe.table.read(v_mid)), ["lang"], _measures())
    feed = _visible(row_changes(pipe.table, v_mid, v_end))
    got = apply_agg_delta(state, feed, ["lang"], _measures())
    want = build_agg(_visible(pipe.table.read(v_end)), ["lang"], _measures())
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_matview_through_physical_expiry(phased, spark):
    """Tombstone expiry is a physical delete of already-invisible rows —
    the visible-row view must be unaffected, and the feed must report the
    expired rows as 'delete' images that the visibility filter drops."""
    pipe, _, v_end = phased
    state = build_agg(_visible(pipe.table.read(v_end)), ["lang"], _measures())
    hi = pipe.table.read(v_end).agg(F.max("warc_ts")).first()[0]
    n = pipe.expire_tombstones(hi)
    v_exp = pipe.table.current_version()
    if n == 0:
        pytest.skip("no tombstones in fixture")
    feed = row_changes(pipe.table, v_end, v_exp)
    assert feed.filter(F.col(CHANGE_TYPE_COL) == "delete").count() == n
    got = apply_agg_delta(state, _visible(feed), ["lang"], _measures())
    want = build_agg(_visible(pipe.table.read(v_exp)), ["lang"], _measures())
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_group_vanishes_when_count_hits_zero(spark):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("lang", StringType()),
            StructField("text", StringType()),
            StructField(CHANGE_TYPE_COL, StringType()),
        ]
    )
    state = build_agg(
        spark.createDataFrame([("xx", "abc")], "lang string, text string"),
        ["lang"],
        _measures(),
    )
    feed = spark.createDataFrame([("xx", "abc", "delete")], schema)
    got = apply_agg_delta(state, feed, ["lang"], _measures())
    assert got.count() == 0


# --- incremental maintenance of an EXPLODED view (anchor counts) -------------


def _anchor_html(*links):
    return "".join(f'<a href="{d}">{t}</a>' for d, t in links).encode()


def test_incremental_anchor_counts_equal_full_recompute(spark, tmp_path):
    """A (dst, anchor)-count view over EXPLODED page content, maintained
    from the row-level change feed: each pre/post image explodes to its
    anchors and contributes ±1 through the standard signed-delta algebra —
    the view never rescans the table. Must equal build_agg over the head
    snapshot, including an update that rewrites a page's links and a
    delete."""
    import pyspark.sql.functions as F

    from airbyte_spark.lake.changes import CHANGE_TYPE_COL, row_changes
    from airbyte_spark.operators.graph import extract_anchors
    from airbyte_spark.operators.matview import apply_agg_delta, build_agg
    from airbyte_spark.schema import CHANGE_SCHEMA
    from airbyte_spark.streaming.pipeline import CdcPipeline

    import datetime as dt

    def ev(url, day, lsn, links, deleted=False, ckpt=0):
        ts = dt.datetime(2024, 1, day)
        return (url, ts, _anchor_html(*links), None, "en", ts,
                ts if deleted else None, lsn, ts, ckpt)

    pipe = CdcPipeline.create_target(spark, str(tmp_path / "t"), n_buckets=2)
    pipe.extract = False  # keep html authoritative; no text extraction here
    b1 = [
        ev("p1", 1, 1, [("d1", "home"), ("d2", "about")]),
        ev("p2", 1, 2, [("d1", "home")]),
        ev("p3", 1, 3, [("d3", "x")]),
    ]
    pipe.apply_batch(spark.createDataFrame(b1, CHANGE_SCHEMA), "b1")
    v_mid = pipe.table.current_version()

    b2 = [
        ev("p1", 2, 4, [("d1", "start"), ("d1", "home")]),  # rewrites links
        ev("p3", 2, 5, [], deleted=True),                   # delete p3
        ev("p4", 2, 6, [("d2", "about")]),                  # new page
    ]
    pipe.apply_batch(spark.createDataFrame(b2, CHANGE_SCHEMA), "b2")

    def anchors_of(df):
        live = df.filter(F.col("_ab_cdc_deleted_at").isNull())
        return extract_anchors(live.select("url", "html"))

    state = build_agg(anchors_of(pipe.table.read(v_mid)), ["dst", "anchor"], {"n": None})
    feed = row_changes(pipe.table, v_mid).filter(F.col("_ab_cdc_deleted_at").isNull())
    feed_anchors = extract_anchors(
        feed.select("url", "html", CHANGE_TYPE_COL), keep_cols=(CHANGE_TYPE_COL,)
    )
    got_df = apply_agg_delta(state, feed_anchors, ["dst", "anchor"], {"n": None})
    want_df = build_agg(anchors_of(pipe.table.read()), ["dst", "anchor"], {"n": None})

    got = {(r["dst"], r["anchor"]): r["n"] for r in got_df.collect()}
    want = {(r["dst"], r["anchor"]): r["n"] for r in want_df.collect()}
    assert got == want
    assert got[("d1", "home")] == 2          # p1 rewrite keeps one + p2's original
    assert ("d3", "x") not in got            # deleted page's anchors retract
