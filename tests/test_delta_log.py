"""DeltaLogTable: a second, independent TableFormat binding (Delta-style
action log) must run the UNCHANGED merge/pipeline code to the identical
final state as the default JSON-manifest lake — the hard proof of the
table-format seam."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.delta_log import DeltaLogTable
from airbyte_spark.lake.table_format import TableFormat
from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.streaming.pipeline import CdcPipeline


def test_satisfies_protocol(spark, tmp_path):
    t = DeltaLogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([], "id bigint").schema,
    )
    assert isinstance(t, TableFormat)
    assert DeltaLogTable.exists(str(tmp_path / "t"))
    assert not DeltaLogTable.exists(str(tmp_path / "nope"))


def _final(pipe):
    return sorted(
        (r["url"], r["warc_ts"], r["text"], r["_ab_cdc_lsn"])
        for r in pipe.final_state().collect()
    )


def test_replay_through_delta_log_equals_default_format(spark, sf_dir, tmp_path):
    ch = read_changelog(spark, sf_dir)
    ref = CdcPipeline.create_target(spark, str(tmp_path / "ref"), n_buckets=4)
    ref.replay(ch)

    pipe = CdcPipeline.create_target(
        spark, str(tmp_path / "dl"), n_buckets=4, table_format=DeltaLogTable
    )
    assert isinstance(pipe.table, DeltaLogTable)
    pipe.replay(ch)
    assert _final(pipe) == _final(ref)

    # idempotent re-replay: committed checkpoint keys skip, version frozen
    v = pipe.table.current_version()
    results = pipe.replay(ch)
    assert all(r.skipped for r in results)
    assert pipe.table.current_version() == v

    # re-open from disk (driver restart): same state, same committed set
    re = CdcPipeline.create_target(
        spark, str(tmp_path / "dl"), n_buckets=4, table_format=DeltaLogTable
    )
    assert _final(re) == _final(ref)
    assert re.table.committed().keys() == pipe.table.committed().keys()


def test_schema_evolution_without_rewrites(spark, sf_dir, tmp_path):
    ch = read_changelog(spark, sf_dir, batch_span=500)
    pipe = CdcPipeline.create_target(
        spark, str(tmp_path / "dl"), n_buckets=4, table_format=DeltaLogTable
    )
    pipe.apply_batch(ch.filter(F.col("checkpoint_id") == 0), "ck-0")
    files_before = {e.path for e in pipe.table.files()}
    one_url = ch.select("url").first()["url"]
    widened = (
        ch.filter((F.col("checkpoint_id") == 1) & (F.col("url") == one_url))
        .withColumn("mime", F.lit("text/html"))
    )
    pipe.apply_batch(widened, "ck-1")
    got = pipe.table.read()
    assert "mime" in got.columns
    # untouched buckets keep their generation-0 files (no rewrite), and
    # their rows read back NULL-filled under the evolved schema
    untouched = files_before & {e.path for e in pipe.table.files()}
    assert untouched, "evolution must not rewrite unaffected files"
    n_old = got.filter(F.col("mime").isNull()).count()
    n_new = got.filter(F.col("mime") == "text/html").count()
    assert n_old > 0 and n_new > 0


def test_compact_vacuum_expire_preserve_state(spark, sf_dir, tmp_path):
    ch = read_changelog(spark, sf_dir, batch_span=1_000)
    pipe = CdcPipeline.create_target(
        spark, str(tmp_path / "dl"), n_buckets=4, table_format=DeltaLogTable
    )
    pipe.replay(ch)
    want = _final(pipe)
    t = pipe.table
    t.compact(target_file_bytes=256 * 1024 * 1024)
    assert _final(pipe) == want
    # expire folds old log versions into a checkpoint; vacuum drops the
    # data files those versions referenced exclusively
    assert t.expire_snapshots(retain_last=2) > 0
    t.vacuum(retain_last=1)
    assert _final(pipe) == want
    assert t.committed(), "checkpoint keys must survive log compaction"


def test_vacuum_grace_spares_inflight_staged_files(spark, sf_dir, tmp_path):
    """grace_s must be honored (same contract as LakeTable.vacuum): a
    writer stages data files BEFORE its O_EXCL log publish, so a vacuum
    overlapping that window sees them as orphans. With a grace above the
    stage→publish latency the young files survive and the racing commit
    lands intact; with grace 0 (quiesced maintenance) they are removed."""
    import os

    ch = read_changelog(spark, sf_dir, batch_span=1_000)
    pipe = CdcPipeline.create_target(
        spark, str(tmp_path / "dl"), n_buckets=4, table_format=DeltaLogTable
    )
    pipe.apply_batch(ch.filter(F.col("checkpoint_id") == 0), "ck-0")
    t = pipe.table
    # simulate an in-flight commit: staged but not yet published (table-
    # shaped rows, as a real writer stages)
    read_v = t.current_version()
    staged = t._stage_write(t.read().limit(50), [], one_file_per_partition=True)
    staged_abs = [os.path.join(t.path, e.path) for e in staged]
    assert all(os.path.exists(p) for p in staged_abs)
    assert t.vacuum(retain_last=1, grace_s=3600.0) == 0
    assert all(os.path.exists(p) for p in staged_abs), "young staged files"
    # the in-flight commit now publishes cleanly — snapshot not corrupted
    t.commit(staged, operation="append", read_version=read_v)
    n_after = t.read().count()
    assert n_after > 0
    # age the files past the grace and a maintenance vacuum on a NEWLY
    # staged (still orphan) file removes it
    orphan = t._stage_write(t.read().limit(10), [], one_file_per_partition=True)
    for e in orphan:
        ap = os.path.join(t.path, e.path)
        os.utime(ap, (1, 1))
    assert t.vacuum(retain_last=1, grace_s=3600.0) >= len(orphan)
    assert t.read().count() == n_after


def test_mor_sidecars_explicitly_out_of_scope(spark, tmp_path):
    t = DeltaLogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([], "id bigint").schema,
    )
    with pytest.raises(NotImplementedError):
        t.read(with_positions=True)
    with pytest.raises(NotImplementedError):
        t.commit([], delete_files_added=[{"path": "x"}])
