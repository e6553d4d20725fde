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
