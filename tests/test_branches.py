"""Write-Audit-Publish branches (lake/format.py create_branch/publish_branch).

Contract under test (≡ Iceberg branch + WAP workflow, the staged-commit
equivalent of the reference's raw-table-then-swap destination write path):
- writes on a branch are invisible to main readers until publish,
- publish is an atomic fast-forward: main adopts the branch HEAD as its
  next version in one manifest write; the branch is then gone,
- a main commit after the fork makes publish raise CommitConflict and
  leaves both main and the branch intact,
- drop_branch abandons staged work without touching main,
- vacuum on main never deletes files only a live branch references,
- schema evolution staged on a branch lands on main only at publish.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.format import CommitConflict, LakeTable, PartitionSpec


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )


def _make_table(spark, sf_dir, path):
    src = _events(spark, sf_dir)
    t = LakeTable.create(spark, str(path), src.schema, PartitionSpec())
    t.append(src.filter(F.col("event_id") % 2 == 0), checkpoint_key="base")
    return t, src


def test_branch_writes_invisible_until_publish(spark, sf_dir, tmp_path):
    t, src = _make_table(spark, sf_dir, tmp_path / "t")
    main_rows = t.read().count()
    main_v = t.current_version()

    br = t.create_branch("audit")
    br.append(src.filter(F.col("event_id") % 2 == 1), checkpoint_key="staged")

    # main is untouched: same version, same rows
    assert t.current_version() == main_v
    assert t.read().count() == main_rows
    # the branch handle sees base + staged
    assert br.read().count() == src.count()
    assert t.branches() == ["audit"]

    v = t.publish_branch("audit")
    assert v == main_v + 1
    assert t.current_version() == v
    assert t.read().count() == src.count()
    assert t.branches() == []
    assert t.manifest()["operation"] == "publish-branch:audit"
    # staged checkpoint key survives the publish (idempotent replay guard)
    assert "staged" in t.committed()


def test_publish_conflict_when_main_advances(spark, sf_dir, tmp_path):
    t, src = _make_table(spark, sf_dir, tmp_path / "t")
    br = t.create_branch("wap")
    br.append(src.limit(10).withColumn("event_id", F.col("event_id") + 10_000_000))

    # concurrent writer lands on main after the fork
    t.append(src.filter(F.col("event_id") % 2 == 1), checkpoint_key="racer")
    main_v = t.current_version()
    main_rows = t.read().count()

    with pytest.raises(CommitConflict):
        t.publish_branch("wap")
    # both lines intact: main kept the racer's commit, branch still readable
    assert t.current_version() == main_v
    assert t.read().count() == main_rows
    assert t.branches() == ["wap"]
    assert t.branch("wap").read().count() > 0


def test_drop_branch_leaves_main_untouched(spark, sf_dir, tmp_path):
    t, src = _make_table(spark, sf_dir, tmp_path / "t")
    main_v = t.current_version()
    br = t.create_branch("scratch")
    br.append(src.limit(5))
    t.drop_branch("scratch")
    assert t.branches() == []
    assert t.current_version() == main_v
    # recreate under the same name works after a drop
    t.create_branch("scratch")
    assert t.branches() == ["scratch"]


def test_vacuum_preserves_branch_files(spark, sf_dir, tmp_path):
    t, src = _make_table(spark, sf_dir, tmp_path / "t")
    br = t.create_branch("staged")
    staged_rows = src.filter(F.col("event_id") % 2 == 1)
    br.append(staged_rows, checkpoint_key="s1")

    # churn main so old main files become unreferenced BY MAIN — but the
    # branch forked from the old snapshot still references them
    t.overwrite(t.read())
    removed = t.vacuum()
    assert removed >= 0
    # branch data files (its own staged ones AND the pre-overwrite base
    # files it forked from) survive; the branch still reads correctly
    assert br.read().count() == src.count()


def test_branch_schema_evolution_publishes_atomically(spark, sf_dir, tmp_path):
    t, src = _make_table(spark, sf_dir, tmp_path / "t")
    br = t.create_branch("evolve")
    widened = src.filter(F.col("event_id") % 2 == 1).withColumn("score", F.lit(1.5))
    br.evolve_schema(widened.schema)
    br.append(widened)

    # main schema unchanged pre-publish
    assert "score" not in t.schema().fieldNames()
    t.publish_branch("evolve")
    assert "score" in t.schema().fieldNames()
    out = t.read()
    assert out.filter(F.col("score").isNotNull()).count() == widened.count()
    assert out.filter(F.col("score").isNull()).count() == src.count() - widened.count()


def test_branch_guards(spark, sf_dir, tmp_path):
    t, _ = _make_table(spark, sf_dir, tmp_path / "t")
    br = t.create_branch("a")
    with pytest.raises(ValueError):
        br.create_branch("nested")
    with pytest.raises(ValueError):
        t.create_branch("a")
