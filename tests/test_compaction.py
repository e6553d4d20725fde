"""Small-file compaction: bin-pack rewrite as one metadata commit.

The CDC sink's checkpointed commits produce many small files; compact()
must merge them without changing table contents, keep older versions
time-travelable until vacuum, preserve pruning stats, and re-encode
old-schema generations at the current schema.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StructField

from airbyte_spark.lake.format import LakeTable, PartitionSpec


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )


def test_compact_unpartitioned_merges_files(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t"), src.schema, PartitionSpec())
    for i in range(4):
        t.append(
            src.filter(F.col("event_id") % 4 == i).repartition(3),
            checkpoint_key=f"ck-{i}",
            stat_cols=["event_id"],
        )
    pre_version = t.manifest()["version"]
    pre_files = t.files()
    assert len(pre_files) >= 8
    total = src.count()

    v = t.compact(target_file_bytes=1 << 30)
    assert v == pre_version + 1
    post = t.files()
    assert len(post) == 1  # everything fits one target-size file
    assert t.read().count() == total
    assert (
        t.read().agg(F.sum("event_id")).first()[0]
        == src.agg(F.sum("event_id")).first()[0]
    )
    # pruning stats re-derived on the rewritten file
    assert "event_id" in post[0].stats and "min" in post[0].stats["event_id"]
    # committed checkpoint keys survive (compaction is not a data commit)
    assert {f"ck-{i}" for i in range(4)} <= set(t.committed())
    # time travel: the pre-compaction snapshot still reads (files on disk)
    assert t.read(version=pre_version).count() == total
    # vacuum reclaims exactly the replaced files; current read unaffected
    assert t.vacuum() == len(pre_files)
    assert t.read().count() == total


def test_compact_partitioned_keeps_layout(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    t = LakeTable.create(
        spark,
        str(tmp_path / "tp"),
        src.schema,
        PartitionSpec.bucket("event_id", 4),
    )
    for i in range(3):
        t.append(src.filter(F.col("event_id") % 3 == i), stat_cols=["event_id"])
    assert len(t.files()) == 12  # 3 commits x 4 buckets
    t.compact(target_file_bytes=1 << 30)
    post = t.files()
    assert len(post) == 4  # one file per bucket
    assert sorted(e.partition[t.partition_spec().names()[0]] for e in post) == [
        0,
        1,
        2,
        3,
    ]
    assert t.read().count() == src.count()


def test_compact_noop_below_min_files(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t1"), src.schema, PartitionSpec())
    t.append(src.coalesce(1))
    v = t.manifest()["version"]
    assert t.compact() == v  # single file: nothing to do
    assert len(t.files()) == 1


def test_compact_skips_large_files(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t2"), src.schema, PartitionSpec())
    t.append(src.coalesce(1))  # one "large" file
    t.append(src.limit(10).coalesce(1))
    t.append(src.limit(10).coalesce(1))
    big = max(e.bytes for e in t.files())
    t.compact(target_file_bytes=big)  # only the two small files qualify
    post = t.files()
    assert len(post) == 2
    assert t.read().count() == src.count() + 20


def test_compact_migrates_old_schema_generation(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t3"), src.schema, PartitionSpec())
    t.append(src.limit(50).repartition(2))
    wide = src.schema.add(StructField("extra", LongType(), True))
    t.evolve_schema(wide)
    t.append(
        src.limit(20).withColumn("extra", F.lit(7)).repartition(2)
    )
    old_sids = {e.schema_id for e in t.files()}
    assert len(old_sids) == 2  # two schema generations on disk
    t.compact(target_file_bytes=1 << 30)
    post = t.files()
    assert {e.schema_id for e in post} == {t.manifest()["schema_id"]}
    got = t.read()
    assert got.count() == 70
    # NULL-filled for the old generation, preserved for the new one
    assert got.filter(F.col("extra") == 7).count() == 20
    assert got.filter(F.col("extra").isNull()).count() == 50


def test_auto_compaction_bounds_file_count(spark, sf_dir, tmp_path):
    """Per-checkpoint small-batch ingest with auto_compact_files set must
    keep the live file count bounded and change no state vs a plain
    replay; exactly-once (committed set) is unaffected by the interleaved
    maintenance commits."""
    import tempfile

    from airbyte_spark.sources.changelog import read_changelog
    from airbyte_spark.streaming.pipeline import CdcPipeline

    ch = read_changelog(spark, sf_dir, batch_span=100)  # 10 segments at sf0.001

    # merge-on-read: every commit APPENDS winner files (CoW rewrites its
    # bucket wholesale, so MoR/append is where small files accumulate)
    auto = CdcPipeline.create_target(
        spark, str(tmp_path / "auto"), n_buckets=2, write_mode="mor"
    )
    auto.auto_compact_files = 6
    auto.replay(ch, group_size=1)

    plain = CdcPipeline.create_target(
        spark, str(tmp_path / "plain"), n_buckets=2, write_mode="mor"
    )
    plain.replay(ch, group_size=1)

    n_auto = len(auto.table.files())
    n_plain = len(plain.table.files())
    assert n_auto < n_plain, (n_auto, n_plain)
    assert n_auto <= 6 + 2  # bounded: threshold + one batch's bucket spill

    cols = ["url", "warc_ts", "text", "lang", "_ab_cdc_lsn"]
    got = sorted(tuple(r[c] for c in cols) for r in auto.final_state().collect())
    want = sorted(tuple(r[c] for c in cols) for r in plain.final_state().collect())
    assert got == want

    # committed checkpoint set identical → replay skips everything
    again = auto.replay(ch, group_size=1)
    assert all(r.skipped for r in again)


def test_register_view_snapshot_isolation(spark, tmp_path):
    import pyspark.sql.functions as F

    from airbyte_spark.lake.format import LakeTable, PartitionSpec

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([(1, "a")], "id long, v string").schema,
        PartitionSpec(),
    )
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.register_view("sql_view_t")
    assert spark.sql("SELECT count(*) AS n FROM sql_view_t").collect()[0]["n"] == 2
    # a later commit must not shift results under the registered view
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    assert spark.sql("SELECT count(*) AS n FROM sql_view_t").collect()[0]["n"] == 2
    # re-register picks up the new snapshot
    t.register_view("sql_view_t")
    assert spark.sql("SELECT max(id) AS m FROM sql_view_t").collect()[0]["m"] == 3
