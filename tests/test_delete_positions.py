"""Position-delete files (≡ Iceberg v2 positional deletes / deletion
vectors): rows vanish from every read without rewriting data files; a
later rewrite materializes the deletions and drops the sidecar."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.dml import delete_positions
from airbyte_spark.lake.format import LakeTable, PartitionSpec


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([], "id long, v long").schema,
        PartitionSpec(),
    )
    t.append(spark.createDataFrame([(i, i * 10) for i in range(10)], "id long, v long"))
    t.append(spark.createDataFrame([(i, i * 10) for i in range(10, 20)], "id long, v long"))
    return t


def test_delete_positions_no_rewrite(table, spark):
    files_before = {e.path for e in table.files()}
    res = delete_positions(table, "id % 3 = 0")
    assert res["rows_deleted"] == 7  # 0,3,6,9,12,15,18
    # data files untouched; one sidecar committed
    assert {e.path for e in table.files()} == files_before
    assert len(table.delete_files()) == 1
    got = sorted(r["id"] for r in table.read().collect())
    assert got == [i for i in range(20) if i % 3 != 0]


def test_time_travel_sees_pre_delete_state(table, spark):
    v0 = table.current_version()
    delete_positions(table, "id < 5")
    assert table.read(v0).count() == 20
    assert table.read().count() == 15


def test_deletes_accumulate_and_idempotent_checkpoint(table, spark):
    delete_positions(table, "id = 1", checkpoint_key="dv-1")
    delete_positions(table, "id = 2", checkpoint_key="dv-2")
    assert table.read().count() == 18
    assert len(table.delete_files()) == 2
    v = table.current_version()
    # redelivery under the same key: no-op, sidecar GC'd
    delete_positions(table, "id = 3", checkpoint_key="dv-1")
    assert table.current_version() == v
    assert table.read().count() == 18
    # re-deleting already-deleted rows: empty match → no commit
    delete_positions(table, "id = 1")
    assert table.current_version() == v


def test_compaction_materializes_and_drops_sidecar(table, spark):
    delete_positions(table, "id >= 15")
    assert table.read().count() == 15
    table.compact(target_file_bytes=1 << 30)
    assert table.delete_files() == []  # all targets rewritten
    assert sorted(r["id"] for r in table.read().collect()) == list(range(15))
    # sidecar file becomes unreferenced-by-head but is still referenced by
    # history manifests until vacuum; fsck stays clean
    assert [i for i in table.fsck() if i["kind"] != "orphan-file"] == []


def test_null_predicate_keeps_row(table, spark):
    t2 = table
    t2.append(spark.createDataFrame([(None, 5)], "id long, v long"))
    res = delete_positions(t2, "id > 100")  # NULL id ⇒ predicate NULL ⇒ keep
    assert res["rows_deleted"] == 0
    assert t2.read().count() == 21


def test_vacuum_preserves_live_sidecars(table, spark):
    delete_positions(table, "id = 7")
    removed = table.vacuum()
    assert removed == 0  # sidecar + data files all referenced
    assert table.read().count() == 19


def test_merge_into_works_on_dv_table(table, spark):
    from airbyte_spark.lake.dml import merge_into

    delete_positions(table, "id = 9")
    src = spark.createDataFrame([(5, 500), (9, 900), (99, 990)], "id long, v long")
    merge_into(
        table, src, on=["id"],
        when_matched_update={"v": "src.v"},
        when_not_matched_insert=True,
    )
    got = {r["id"]: r["v"] for r in table.read().collect()}
    assert got[5] == 500
    assert got[99] == 990
    # id=9 was position-deleted BEFORE the merge: not matched -> re-inserted
    # as a fresh row by the not-matched clause (the DV made it truly absent)
    assert got[9] == 900


def test_rollback_restores_delete_state(table, spark):
    v_data = table.current_version()
    delete_positions(table, "id < 5")
    v_del = table.current_version()
    assert table.read().count() == 15
    # rollback BEFORE the delete: sidecar must not keep applying
    table.rollback(v_data)
    assert table.read().count() == 20
    assert table.delete_files() == []
    # roll forward again TO the delete version: sidecar state restored
    table.rollback(v_del)
    assert table.read().count() == 15
    assert len(table.delete_files()) == 1


def test_dv_on_table_with_file_and_pos_columns(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "fp"),
        spark.createDataFrame([], "id long, file string, pos long").schema,
        PartitionSpec(),
    )
    t.append(
        spark.createDataFrame(
            [(1, "a.txt", 5), (2, "b.txt", 6)], "id long, file string, pos long"
        )
    )
    delete_positions(t, "id = 1")
    got = t.read().collect()
    assert len(got) == 1 and got[0]["file"] == "b.txt"


def test_row_changes_sees_position_deletes(table, spark):
    from airbyte_spark.lake.changes import row_changes

    v0 = table.current_version()
    delete_positions(table, "id IN (3, 17)")
    feed = row_changes(table, v0, key_cols=["id"]).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append(r["id"])
    assert sorted(by_type.get("delete", [])) == [3, 17]
    assert "insert" not in by_type and "update_preimage" not in by_type


def test_stats_summary_accounts_for_dv(table, spark):
    assert table.stats_summary()["rows"] == 20
    delete_positions(table, "id = 0")
    st = table.stats_summary()
    assert st["rows"] == 19  # all sidecar targets live -> exact subtraction
    assert st["columns"] == {}  # min/max no longer trustworthy under DVs


def test_delete_where_count_exact_after_dv(table, spark):
    from airbyte_spark.lake.dml import delete_where

    delete_positions(table, "id IN (0, 1, 2, 3, 4)")  # 5 rows gone via DV
    res = delete_where(table, "id IN (5, 6, 7)")  # CoW delete of 3 more
    assert res["rows_deleted"] == 3  # NOT 8: DV rows must not be recounted
    assert table.read().count() == 12


def test_concurrent_rewrite_conflicts_with_staged_sidecar(table, spark):
    from airbyte_spark.lake.format import CommitConflict

    # simulate the race: build a sidecar entry against current files, then
    # compact (rewriting them) before the sidecar commit lands
    entry = {
        "path": "data/deletes-race/zz.parquet",
        "rows": 1,
        "bytes": 10,
        "targets": [table.files()[0].path],
    }
    table.compact(target_file_bytes=1 << 30)
    with pytest.raises(CommitConflict, match="sidecar targets"):
        table.commit([], operation="delete-positions", delete_files_added=[entry])
