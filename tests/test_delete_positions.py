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
