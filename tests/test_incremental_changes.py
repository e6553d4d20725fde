"""Incremental snapshot-diff read: consumers resume from a version and see
exactly the rows committed after it, planned by manifest set-difference."""

from __future__ import annotations

import pyspark.sql.functions as F

from airbyte_spark.lake.format import LakeTable, PartitionSpec


def _table(spark, tmp_path):
    df = spark.range(0, 300).select(F.col("id").alias("k"))
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, PartitionSpec())
    versions = []
    t.append(df.filter(F.col("k") < 100), checkpoint_key="c0")
    versions.append(t.current_version())
    t.append(df.filter(F.col("k").between(100, 199)), checkpoint_key="c1")
    versions.append(t.current_version())
    t.append(df.filter(F.col("k") >= 200), checkpoint_key="c2")
    versions.append(t.current_version())
    return t, versions


def test_diff_sees_only_new_commits(spark, tmp_path):
    t, (v0, v1, _) = _table(spark, tmp_path)
    got = sorted(r["k"] for r in t.changes_between(v0).collect())
    assert got == list(range(100, 300))
    got2 = sorted(r["k"] for r in t.changes_between(v1).collect())
    assert got2 == list(range(200, 300))


def test_diff_same_version_is_empty(spark, tmp_path):
    t, _ = _table(spark, tmp_path)
    assert t.changes_between(t.current_version()).count() == 0


def test_diff_bounded_above(spark, tmp_path):
    t, (v0, v1, _) = _table(spark, tmp_path)
    got = sorted(r["k"] for r in t.changes_between(v0, v1).collect())
    assert got == list(range(100, 200))


def test_diff_from_zero_is_full_table(spark, tmp_path):
    t, _ = _table(spark, tmp_path)
    assert t.changes_between(0).count() == 300


def test_overwrite_diff_is_new_content(spark, tmp_path):
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, PartitionSpec())
    t.append(df, checkpoint_key="c0")
    v1 = t.current_version()
    t.overwrite(df.filter(F.col("k") < 10))
    got = sorted(r["k"] for r in t.changes_between(v1).collect())
    assert got == list(range(10))
