"""Partition-spec evolution: re-clustering under a new bucket count must
be read-equivalent, atomic, and keep merge's bucket pruning correct."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.format import LakeTable, PartitionSpec


def test_respec_read_equivalence_and_layout(spark, tmp_path):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, PartitionSpec.bucket("k", 2)
    )
    t.append(df, checkpoint_key="c0", stat_cols=["k"])
    before = sorted((r["k"], r["v"]) for r in t.read().collect())
    v_old = t.current_version()

    t.rewrite_partition_spec(PartitionSpec.bucket("k", 8))
    assert sorted((r["k"], r["v"]) for r in t.read().collect()) == before
    assert t.partition_spec().fields[0].n == 8
    # every live file carries a new-spec bucket value in [0, 8)
    buckets = {int(e.partition["p_bucket"]) for e in t.files()}
    assert buckets <= set(range(8)) and len(buckets) > 2
    # stats survive the rewrite (pruning keeps working)
    assert all("k" in e.stats for e in t.files())
    # the old snapshot still reads under its own layout
    assert t.read(version=v_old).count() == 500


def test_respec_detects_concurrent_append(spark, tmp_path, monkeypatch):
    """An append landing between the rewrite's snapshot read and its
    commit must abort the rewrite (stale-spec partition values would
    poison merge pruning), not be silently dropped or kept unclustered."""
    from airbyte_spark.lake.format import CommitConflict

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, PartitionSpec.bucket("k", 2)
    )
    t.append(df, checkpoint_key="c0")

    real_stage = t._stage_write
    raced = []

    def racing_stage(*args, **kwargs):
        staged = real_stage(*args, **kwargs)
        if not raced:  # the injected append re-enters this patch — race once
            raced.append(True)
            # concurrent writer lands after the rewrite staged its files
            t.append(df.select((F.col("k") + 100).alias("k")), checkpoint_key="c1")
        return staged

    monkeypatch.setattr(t, "_stage_write", racing_stage)
    with pytest.raises(CommitConflict):
        t.rewrite_partition_spec(PartitionSpec.bucket("k", 4))
    # the concurrent append's rows are intact and the spec did not flip
    assert t.read().count() == 200
    assert t.partition_spec().fields[0].n == 2


def test_merge_pruning_correct_after_respec(spark, sf_dir, tmp_path):
    """Grow the bucket count mid-stream: replay half the changelog, respec
    4→16, replay the rest — final state must equal the single-spec run
    (a stale-bucket pruning bug would silently drop updates)."""
    from airbyte_spark.sources.changelog import read_changelog
    from airbyte_spark.streaming.pipeline import CdcPipeline

    ch = read_changelog(spark, sf_dir)
    ckpts = sorted(r[0] for r in ch.select("checkpoint_id").distinct().collect())
    half = ckpts[: max(1, len(ckpts) // 2)]

    pipe = CdcPipeline.create_target(spark, str(tmp_path / "a"), n_buckets=4)
    pipe.replay(ch.filter(F.col("checkpoint_id").isin([int(c) for c in half])))
    pipe.table.rewrite_partition_spec(
        PartitionSpec.bucket("url", 16), stat_cols=["url"]
    )
    pipe.replay(ch)

    ref = CdcPipeline.create_target(spark, str(tmp_path / "b"), n_buckets=4)
    ref.replay(ch)

    got = sorted(
        (r["url"], r["_ab_cdc_lsn"])
        for r in pipe.final_state().select("url", "_ab_cdc_lsn").collect()
    )
    want = sorted(
        (r["url"], r["_ab_cdc_lsn"])
        for r in ref.final_state().select("url", "_ab_cdc_lsn").collect()
    )
    assert got == want
