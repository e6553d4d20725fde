"""Lake consistency audit (LakeTable.fsck)."""

import json
import os

from airbyte_spark.lake.format import LakeTable, PartitionSpec


def _t(spark, tmp_path, props=None):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, PartitionSpec(), properties=props or {}
    )
    t.append(df, checkpoint_key="c1", stat_cols=["id"])
    return t


def test_healthy_table_has_no_issues(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.append(
        spark.createDataFrame([(3, "c")], "id bigint, v string"),
        checkpoint_key="c2",
        stat_cols=["id"],
    )
    assert t.fsck() == []


def test_missing_and_torn_files_detected(spark, tmp_path):
    t = _t(spark, tmp_path)
    files = t.files()
    victim = os.path.join(t.path, files[0].path)
    os.truncate(victim, 10)
    kinds = {i["kind"] for i in t.fsck()}
    assert "size-mismatch" in kinds
    os.remove(victim)
    kinds = {i["kind"] for i in t.fsck()}
    assert "missing-file" in kinds


def test_orphan_files_reported_not_fatal(spark, tmp_path):
    t = _t(spark, tmp_path)
    stray = os.path.join(t.path, "data", "stray.parquet")
    with open(stray, "wb") as fh:
        fh.write(b"not really parquet")
    issues = t.fsck()
    assert [i["kind"] for i in issues] == ["orphan-file"]
    # vacuum reclaims it and fsck goes clean
    t.vacuum()
    assert t.fsck() == []


def test_old_snapshot_files_are_not_orphans(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(9, "z")], "id bigint, v string"))
    # the replaced files are still referenced by the retained v1 manifest
    assert t.fsck() == []


def test_bad_stats_and_missing_bloom_detected(spark, tmp_path):
    t = _t(spark, tmp_path, props={"bloom.key": "id"})
    # blooms written: removing the sidecar must be flagged
    e = t.files()[0]
    side = os.path.join(t.path, e.path) + ".bloom"
    assert os.path.exists(side)
    os.remove(side)
    kinds = {i["kind"] for i in t.fsck()}
    assert "missing-bloom" in kinds
    # corrupt a min/max pair in the manifest directly
    mp = t._manifest_path(t.current_version())
    with open(mp) as fh:
        m = json.load(fh)
    col_stats = m["files"][0]["stats"]["id"]
    col_stats["min"], col_stats["max"] = 99, 1
    with open(mp, "w") as fh:
        json.dump(m, fh)
    kinds = {i["kind"] for i in t.fsck()}
    assert "bad-stats" in kinds
