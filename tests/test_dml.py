"""Row-level DML (lake/dml.py): copy-on-write DELETE and REPLACE WHERE.

Contract under test:
- only files that actually contain predicate-TRUE rows are rewritten;
  non-matching files keep their exact manifest entries (paths untouched),
- SQL three-valued logic: NULL-predicate rows SURVIVE a delete,
- a no-match delete is a metadata no-op (no new version),
- replace_where is one atomic snapshot (delete region + insert), rejects
  replacement rows outside its own predicate,
- stats coverage survives the rewrite (future pruning not degraded),
- time travel to the pre-DML snapshot still works.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from airbyte_spark.lake.dml import delete_where, replace_where
from airbyte_spark.lake.format import LakeTable, PartitionSpec


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )


def _make_table(spark, sf_dir, path, spec=None, n_commits=4):
    src = _events(spark, sf_dir)
    t = LakeTable.create(spark, str(path), src.schema, spec or PartitionSpec())
    for i in range(n_commits):
        t.append(
            src.filter(F.col("event_id") % n_commits == i),
            checkpoint_key=f"ck-{i}",
            stat_cols=["event_id"],
        )
    return t, src


def test_delete_rewrites_only_matching_files(spark, sf_dir, tmp_path):
    t, src = _make_table(spark, sf_dir, tmp_path / "t")
    total = src.count()
    pre = {e.path for e in t.files()}
    lo = src.agg(F.min("event_id")).first()[0]

    # predicate hits exactly the residue-0 commit's rows
    res = delete_where(t, f"event_id % 4 = 0 AND event_id >= {lo}")
    assert res["rows_deleted"] == src.filter(F.col("event_id") % 4 == 0).count()
    assert res["files_rewritten"] >= 1
    post = {e.path for e in t.files()}
    # non-matching files are byte-identical manifest entries (not rewritten)
    untouched = pre & post
    assert len(untouched) == len(pre) - res["files_rewritten"]
    assert t.read().count() == total - res["rows_deleted"]
    assert t.read().filter(F.col("event_id") % 4 == 0).count() == 0
    # stats preserved on rewritten files
    for e in t.files():
        assert "event_id" in e.stats and "min" in e.stats["event_id"]


def test_delete_no_match_is_noop(spark, sf_dir, tmp_path):
    t, _ = _make_table(spark, sf_dir, tmp_path / "t")
    v0 = t.current_version()
    res = delete_where(t, "event_id < 0")
    assert res == {"version": v0, "files_rewritten": 0, "rows_deleted": 0}
    assert t.current_version() == v0


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, tag string"
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, PartitionSpec())
    t.append(df, stat_cols=["id"])
    delete_where(t, "tag = 'a'")  # NULL tag row must NOT be deleted
    left = {r["id"] for r in t.read().collect()}
    assert left == {2, 3}


def test_delete_with_range_hint_equals_unhinted(spark, sf_dir, tmp_path):
    ta, src = _make_table(spark, sf_dir, tmp_path / "a")
    tb, _ = _make_table(spark, sf_dir, tmp_path / "b")
    mid = src.approxQuantile("event_id", [0.5], 0.0)[0]
    pred = f"event_id <= {int(mid)}"
    ra = delete_where(ta, pred)
    rb = delete_where(tb, pred, ranges={"event_id": (None, int(mid))})
    assert ra["rows_deleted"] == rb["rows_deleted"]
    assert ta.read().count() == tb.read().count()


def test_delete_time_travel_preserves_old_snapshot(spark, sf_dir, tmp_path):
    t, src = _make_table(spark, sf_dir, tmp_path / "t")
    total = src.count()
    v0 = t.current_version()
    delete_where(t, "event_id % 2 = 0")
    assert t.read(version=v0).count() == total


def test_delete_partitioned_table(spark, sf_dir, tmp_path):
    t, src = _make_table(
        spark, sf_dir, tmp_path / "t", spec=PartitionSpec.bucket("event_id", 4)
    )
    n_del = src.filter(F.col("event_type") == "click").count()
    res = delete_where(t, "event_type = 'click'")
    assert res["rows_deleted"] == n_del
    assert t.read().filter(F.col("event_type") == "click").count() == 0
    assert t.read().count() == src.count() - n_del


def test_replace_where_is_atomic_region_swap(spark, sf_dir, tmp_path):
    t, src = _make_table(spark, sf_dir, tmp_path / "t")
    region = F.col("event_type") == "click"
    replacement = (
        src.filter(region)
        .withColumn("value", F.col("value") * 0 + 99.0)
    )
    res = replace_where(t, replacement, "event_type = 'click'")
    assert res["rows_inserted"] == replacement.count()
    assert res["rows_deleted"] == src.filter(region).count()
    got = t.read()
    # region fully replaced, everything else untouched
    assert got.filter(region & (F.col("value") != 99.0)).count() == 0
    assert got.filter(~region).count() == src.filter(~region).count()
    assert got.count() == src.count()


def test_replace_where_rejects_stray_rows(spark, sf_dir, tmp_path):
    t, src = _make_table(spark, sf_dir, tmp_path / "t")
    stray = src.limit(5)  # mixed event types — not all satisfy the predicate
    try:
        replace_where(t, stray, "event_type = 'click'")
    except ValueError:
        pass
    else:
        raise AssertionError("stray replacement rows must raise")


def test_replace_where_into_empty_region_inserts(spark, sf_dir, tmp_path):
    t, src = _make_table(spark, sf_dir, tmp_path / "t")
    hi = src.agg(F.max("event_id")).first()[0]
    new = spark.createDataFrame(
        [(hi + 1, 1, "synthetic", 1.0), (hi + 2, 2, "synthetic", 2.0)],
        t.schema(),
    )
    res = replace_where(t, new, "event_type = 'synthetic'")
    assert res["files_rewritten"] == 0 and res["rows_inserted"] == 2
    assert t.read().filter(F.col("event_type") == "synthetic").count() == 2
    assert t.read().count() == src.count() + 2


# --- UPDATE ------------------------------------------------------------------


def test_update_where_self_reference_and_pruning(spark, tmp_path):
    from airbyte_spark.lake.dml import update_where
    from airbyte_spark.lake.format import LakeTable, PartitionSpec

    rows = [(i, float(i), "a" if i % 2 == 0 else "b") for i in range(100)]
    src = spark.createDataFrame(rows, "id long, v double, tag string")
    t = LakeTable.create(spark, str(tmp_path / "u"), src.schema, PartitionSpec())
    # two files with disjoint id ranges so stats can prune
    t.append(src.filter("id < 50"), checkpoint_key="lo", stat_cols=["id"])
    t.append(src.filter("id >= 50"), checkpoint_key="hi", stat_cols=["id"])

    res = update_where(
        t, "id = 7", {"v": "v * 10 + id"}, ranges={"id": (7, 7)}
    )
    assert res["rows_updated"] == 1 and res["files_rewritten"] == 1  # pruned to one file
    got = {r["id"]: (r["v"], r["tag"]) for r in t.read().collect()}
    assert got[7] == (77.0, "b")          # self-referencing SET
    assert got[8] == (8.0, "a")           # untouched rows byte-stable
    assert len(got) == 100

    # NULL predicate leaves rows unchanged (3VL)
    t2 = LakeTable.create(spark, str(tmp_path / "n"),
                          spark.createDataFrame([(1, None)], "id long, s string").schema,
                          PartitionSpec())
    t2.append(spark.createDataFrame([(1, None), (2, "x")], "id long, s string"),
              checkpoint_key="b0")
    r2 = update_where(t2, F.col("s") == "zzz", {"id": "id + 100"})
    assert r2["rows_updated"] == 0
    assert {r["id"] for r in t2.read().collect()} == {1, 2}

    # unknown column rejected
    import pytest

    with pytest.raises(ValueError, match="unknown columns"):
        update_where(t, "id = 1", {"nope": "1"})

    # no-match is a metadata no-op (no new version)
    v = t.current_version()
    r3 = update_where(t, "id = -1", {"v": "0.0"})
    assert r3["rows_updated"] == 0 and t.current_version() == v


# --- MERGE INTO --------------------------------------------------------------


def _merge_table(spark, tmp_path, name):
    from airbyte_spark.lake.format import LakeTable, PartitionSpec

    rows = [(i, float(i), "keep") for i in range(20)]
    src = spark.createDataFrame(rows, "id long, v double, note string")
    t = LakeTable.create(spark, str(tmp_path / name), src.schema, PartitionSpec())
    t.append(src.filter("id < 10"), checkpoint_key="lo", stat_cols=["id"])
    t.append(src.filter("id >= 10"), checkpoint_key="hi", stat_cols=["id"])
    return t


def test_merge_into_three_clauses(spark, tmp_path):
    from airbyte_spark.lake.dml import merge_into

    t = _merge_table(spark, tmp_path, "m1")
    source = spark.createDataFrame(
        [
            (3, 300.0, "upd"),    # matched → update
            (7, -1.0, "kill"),    # matched → delete (note = 'kill')
            (25, 250.0, "new"),   # not matched → insert
        ],
        "id long, v double, note string",
    )
    res = merge_into(
        t,
        source,
        on=["id"],
        when_matched_update={"v": "src.v + v", "note": "src.note"},
        when_matched_delete="src.note = 'kill'",
    )
    assert (res["rows_updated"], res["rows_deleted"], res["rows_inserted"]) == (1, 1, 1)
    got = {r["id"]: (r["v"], r["note"]) for r in t.read().collect()}
    assert got[3] == (303.0, "upd")     # update saw both sides (src.v + v)
    assert 7 not in got                 # deleted
    assert got[25] == (250.0, "new")    # inserted
    assert got[4] == (4.0, "keep")      # untouched
    assert len(got) == 20


def test_merge_into_guards_and_noop(spark, tmp_path):
    import pytest

    from airbyte_spark.lake.dml import merge_into

    t = _merge_table(spark, tmp_path, "m2")
    dup = spark.createDataFrame(
        [(1, 1.0, "a"), (1, 2.0, "b")], "id long, v double, note string"
    )
    with pytest.raises(ValueError, match="duplicate source keys"):
        merge_into(t, dup, on=["id"], when_matched_update={"v": "src.v"})

    with pytest.raises(ValueError, match="no clauses"):
        merge_into(t, dup.limit(1), on=["id"], when_not_matched_insert=False)

    # insert-only merge with zero new keys = metadata no-op
    v = t.current_version()
    existing = spark.createDataFrame([(1, 9.0, "x")], "id long, v double, note string")
    res = merge_into(t, existing, on=["id"], when_not_matched_insert=True)
    assert res == {
        "version": v, "rows_updated": 0, "rows_deleted": 0, "rows_inserted": 0,
    }
