"""Snapshot rollback (LakeTable.rollback ≡ Iceberg rollback_to_snapshot /
Delta RESTORE): bad-batch recovery with the exactly-once contract intact."""

import pytest

from airbyte_spark.lake.format import LakeTable, PartitionSpec


def _t(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, PartitionSpec())
    t.append(df, checkpoint_key="good-1", stat_cols=["id"])
    return t, df


def test_rollback_restores_state_and_checkpoints(spark, tmp_path):
    t, df = _t(spark, tmp_path)
    v_good = t.current_version()
    bad = spark.createDataFrame([(3, "CORRUPT"), (4, "CORRUPT")], "id bigint, v string")
    t.append(bad, checkpoint_key="bad-1", stat_cols=["id"])
    assert t.read().count() == 4
    assert "bad-1" in t.committed()

    v_new = t.rollback(v_good)
    assert v_new == v_good + 2  # rollback is a NEW commit, not a rewind
    assert t.manifest()["operation"] == "rollback"
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2]
    # exactly-once state reverted WITH the data: bad-1 may be re-delivered
    assert "bad-1" not in t.committed()
    assert "good-1" in t.committed()

    # history preserved: the bad snapshot is still time-travel readable
    assert t.read(version=v_good + 1).count() == 4
    # and re-applying the (fixed) batch lands as a fresh commit
    fixed = spark.createDataFrame([(3, "c")], "id bigint, v string")
    t.append(fixed, checkpoint_key="bad-1", stat_cols=["id"])
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3]


def test_rollback_to_current_is_noop(spark, tmp_path):
    t, _ = _t(spark, tmp_path)
    v = t.current_version()
    assert t.rollback(v) == v
    assert t.current_version() == v


def test_rollback_restores_schema_generation(spark, tmp_path):
    t, df = _t(spark, tmp_path)
    v_good = t.current_version()
    wide = spark.createDataFrame([(5, "e", 1.5)], "id bigint, v string, extra double")
    t.evolve_schema(wide.schema)
    t.append(wide, checkpoint_key="wide-1", stat_cols=["id"])
    assert "extra" in t.schema().fieldNames()
    t.rollback(v_good)
    assert "extra" not in t.schema().fieldNames()
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2]


def test_rollback_after_vacuum_raises(spark, tmp_path):
    t, df = _t(spark, tmp_path)
    v_good = t.current_version()
    t.overwrite(spark.createDataFrame([(9, "z")], "id bigint, v string"))
    t.vacuum()  # reclaims v_good's now-unreferenced files
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.rollback(v_good)
    # table is untouched by the failed rollback
    assert sorted(r["id"] for r in t.read().collect()) == [9]
