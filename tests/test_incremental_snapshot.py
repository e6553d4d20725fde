"""Chunked incremental snapshot (sources/snapshot.py) — the DBLog watermark
algorithm and the lake-to-lake coordinate-carrying variant, both checked
against a from-LSN-0 replay of the same log; plus the end-to-end lake
bootstrap interleave (chunk commits between segment commits, idempotent)."""

from __future__ import annotations

import datetime as dt
import tempfile

import pyspark.sql.functions as F
import pytest

from airbyte_spark.protocol import StreamConfig
from airbyte_spark.schema import CHANGE_SCHEMA
from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.sources.snapshot import (
    bootstrap_pipeline,
    interleaved_state,
    snapshot_chunks,
)


@pytest.fixture(scope="module")
def cfg():
    return StreamConfig(name="pages", schema=CHANGE_SCHEMA)


def ev(url, day, lsn, ckpt=0, deleted=False, text=None):
    ts = dt.datetime(2024, 1, day)
    return (url, ts, None, text, "en", ts, ts if deleted else None, lsn, ts, ckpt)


def full_replay_state(ch, cfg):
    """Reference definition: LWW winner per key over the WHOLE log."""
    from pyspark.sql import Window

    order = [F.col(c).desc_nulls_last() for c in cfg.order_cols]
    w = Window.partitionBy(*cfg.primary_key).orderBy(*order)
    return (
        ch.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & F.col(cfg.deleted_at_field).isNull())
        .drop("_rn")
    )


def keyed(df, cols=("url", "_ab_cdc_lsn")):
    return {r["url"]: tuple(r[c] for c in cols) for r in df.collect()}


# ---------------------------------------------------------------------------
# operator-level equivalence on the driver fixture
# ---------------------------------------------------------------------------


def test_lake_mode_matches_full_replay(spark, sf_dir, cfg):
    ch = read_changelog(spark, sf_dir)
    max_lsn = ch.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    base, step = (max_lsn * 2) // 5, max(1, max_lsn // 20)
    snap = snapshot_chunks(ch, cfg, base, step, n_chunks=8)
    out = interleaved_state(snap, ch.filter(F.col("_ab_cdc_lsn") > base), cfg)
    expect = full_replay_state(ch, cfg)
    assert keyed(out) == keyed(expect)


def test_discard_mode_matches_full_replay(spark, sf_dir, cfg):
    """Foreign-table regime: position-only ordering, no tombstones, no
    coordinates trusted — the watermark discard rule alone must converge.
    The synthetic changelog's cursor is monotone in lsn, so position
    ordering and full ordering agree on the fixture (the hand-built cases
    below cover where they don't)."""
    ch = read_changelog(spark, sf_dir)
    max_lsn = ch.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    base, step = (max_lsn * 2) // 5, max(1, max_lsn // 20)
    snap = snapshot_chunks(
        ch, cfg, base, step, n_chunks=8, keep_tombstones=False, position_only=True
    )
    out = interleaved_state(
        snap, ch.filter(F.col("_ab_cdc_lsn") > base), cfg, discard_in_window=True
    )
    expect = full_replay_state(ch, cfg)
    # discard-mode snapshot rows keep their payload; compare keys + payload
    assert keyed(out, ("url",)) == keyed(expect, ("url",))
    got = {r["url"]: r["text"] for r in out.collect()}
    want = {r["url"]: r["text"] for r in expect.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# hand-built DBLog interleavings
# ---------------------------------------------------------------------------


def mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def one_chunk(spark, cfg, rows, base, step):
    """All keys land in some chunk of a 1-chunk split: lw=base, hw=base+step."""
    ch = mk(spark, rows)
    return snapshot_chunks(
        ch, cfg, base, step, n_chunks=1, keep_tombstones=False, position_only=True
    )


def test_delete_while_chunk_in_flight(spark, cfg):
    """Key deleted by a stream event inside the chunk's watermark window:
    the stale chunk row MUST be discarded (DBLog rule) — emitting it would
    resurrect the key."""
    history = [ev("u1", 1, 1), ev("u2", 1, 2)]
    log = history + [ev("u1", 2, 12, deleted=True)]  # in (10, 20]
    snap = one_chunk(spark, cfg, log, base=10, step=10)
    stream = mk(spark, log).filter(F.col("_ab_cdc_lsn") > 10)
    out = interleaved_state(snap, stream, cfg, discard_in_window=True)
    assert {r["url"] for r in out.collect()} == {"u2"}


def test_update_in_window_supersedes_chunk_row(spark, cfg):
    history = [ev("u1", 1, 1, text="old")]
    log = history + [ev("u1", 2, 15, text="new")]
    snap = one_chunk(spark, cfg, log, base=10, step=10)
    stream = mk(spark, log).filter(F.col("_ab_cdc_lsn") > 10)
    out = interleaved_state(snap, stream, cfg, discard_in_window=True)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["text"] == "new"


def test_event_after_window_beats_surviving_chunk_row(spark, cfg):
    history = [ev("u1", 1, 1, text="old")]
    log = history + [ev("u1", 2, 25, text="late")]  # lsn > hw=20
    snap = one_chunk(spark, cfg, log, base=10, step=10)
    stream = mk(spark, log).filter(F.col("_ab_cdc_lsn") > 10)
    out = interleaved_state(snap, stream, cfg, discard_in_window=True)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["text"] == "late"


def test_untouched_key_survives_via_chunk_row(spark, cfg):
    log = [ev("u1", 1, 1, text="only")]
    snap = one_chunk(spark, cfg, log, base=10, step=10)
    stream = mk(spark, log).filter(F.col("_ab_cdc_lsn") > 10)
    out = interleaved_state(snap, stream, cfg, discard_in_window=True)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["text"] == "only"


def test_key_deleted_before_snapshot_stays_absent(spark, cfg):
    log = [ev("u1", 1, 1), ev("u1", 2, 2, deleted=True), ev("u2", 1, 3)]
    snap = one_chunk(spark, cfg, log, base=10, step=10)
    stream = mk(spark, log).filter(F.col("_ab_cdc_lsn") > 10)
    out = interleaved_state(snap, stream, cfg, discard_in_window=True)
    assert {r["url"] for r in out.collect()} == {"u2"}


def test_lake_mode_tombstone_blocks_late_out_of_order_event(spark, cfg):
    """Lake-to-lake mode's reason to exist: a late stream event whose cursor
    is OLDER than a pre-snapshot delete must not resurrect the key — the
    snapshot's carried tombstone outranks it under (warc_ts, lsn). The
    DBLog regime cannot express this (position ordering assumes no late
    cursors); the lake regime must."""
    history = [ev("u1", 5, 1), ev("u1", 6, 2, deleted=True)]  # deleted at day 6
    late = [ev("u1", 3, 12, text="zombie")]  # arrives after base, older cursor
    log = history + late
    ch = mk(spark, log)
    snap = snapshot_chunks(ch, cfg, 10, 10, n_chunks=1, keep_tombstones=True)
    out = interleaved_state(snap, ch.filter(F.col("_ab_cdc_lsn") > 10), cfg)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# end-to-end lake bootstrap
# ---------------------------------------------------------------------------


def test_bootstrap_pipeline_equals_full_replay(spark, sf_dir, cfg):
    from airbyte_spark.streaming.pipeline import CdcPipeline

    ch = read_changelog(spark, sf_dir)
    max_lsn = ch.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    base, step = (max_lsn * 2) // 5, max(1, max_lsn // 16)

    root = tempfile.mkdtemp(prefix="snap_boot_")
    boot = CdcPipeline.create_target(spark, root + "/boot", n_buckets=4)
    results = bootstrap_pipeline(boot, ch, base, step, n_chunks=4)

    full = CdcPipeline.create_target(spark, root + "/full", n_buckets=4)
    full.replay(ch)

    got = {r["url"]: (r["_ab_cdc_lsn"], r["text"]) for r in boot.final_state().collect()}
    want = {r["url"]: (r["_ab_cdc_lsn"], r["text"]) for r in full.final_state().collect()}
    assert got == want

    committed = set(boot.table.committed())
    assert {f"snap-{c}" for c in range(4)} <= committed

    # idempotence: re-running the bootstrap applies nothing new
    n_before = len(boot.table.committed())
    again = bootstrap_pipeline(boot, ch, base, step, n_chunks=4)
    assert all(r.skipped for r in again)
    assert len(boot.table.committed()) == n_before
