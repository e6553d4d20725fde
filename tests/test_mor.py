"""Merge-on-read write mode: append-winners commits, read-time LWW
resolution, version compaction, tombstone-expiry safety.

The contract: a MoR replay's observable state is byte-identical to the
copy-on-write replay (and the DuckDB oracle) at every point, while its
write path NEVER reads or rewrites an existing file — the write-optimized
end of the CDC trade (≡ Iceberg v2 MoR; ≡ the reference's append-raw +
dedup-at-normalization split)."""

from __future__ import annotations

import datetime as dt

import pytest

from airbyte_spark.lake.merge import compact_versions, resolve_stored
from airbyte_spark.schema import CHANGE_SCHEMA
from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.streaming.pipeline import CdcPipeline

from tests.test_e2e_replay import oracle_final_state

T = dt.datetime(2024, 1, 1)

FINAL_COLS = ["url", "warc_ts", "text", "lang", "_ab_cdc_lsn"]


def ev(url, lsn, ckpt, text="x", deleted=None, html=None):
    ts = T + dt.timedelta(minutes=lsn)
    return (url, ts, html, text, "en", ts, deleted, lsn, ts, ckpt)


def batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


@pytest.fixture(scope="module")
def mor_replayed(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mor") / "pages")
    pipe = CdcPipeline.create_target(spark, path, n_buckets=8, write_mode="mor")
    pipe.replay(read_changelog(spark, sf_dir))
    return pipe


def final_rows(pipe):
    return [
        tuple(r) for r in pipe.final_state().select(*FINAL_COLS).orderBy("url").collect()
    ]


def test_mor_final_state_matches_oracle(mor_replayed, sf_dir):
    assert final_rows(mor_replayed) == oracle_final_state(sf_dir)


def test_mor_write_path_never_rewrites(mor_replayed):
    """Every commit is purely additive: no snapshot ever removed a file
    (that is the whole point of MoR) and multiple versions are retained."""
    t = mor_replayed.table
    for h in t.history():
        if h.get("operation") in ("create",):
            continue
        assert h["operation"] == "append-winners"
        assert (h.get("commit") or {}).get("files_removed", 0) == 0
    # stored rows can only accumulate (≥ resolved keys; strict multi-version
    # retention is pinned in test_mor_lww_and_late_events where batches
    # genuinely overlap — the sf0.001 fixture has a single checkpoint)
    assert t.read().count() >= mor_replayed.raw_state().count()


def test_mor_exactly_once_redelivery(mor_replayed, spark, sf_dir):
    v = mor_replayed.table.current_version()
    results = mor_replayed.replay(read_changelog(spark, sf_dir))
    assert all(r.skipped for r in results)
    assert mor_replayed.table.current_version() == v


def test_compact_versions_preserves_state(mor_replayed, sf_dir):
    t = mor_replayed.table
    before = final_rows(mor_replayed)
    v = compact_versions(t, mor_replayed.cfg)
    assert t.current_version() == v
    assert t.manifest()["operation"] == "compact-versions"
    # post-compaction: stored rows == resolved rows (one version per key)
    assert t.read().count() == resolve_stored(t, mor_replayed.cfg).count()
    assert final_rows(mor_replayed) == before == oracle_final_state(sf_dir)
    # compacting an already-compact table is a no-op-sized rewrite, still equal
    compact_versions(t, mor_replayed.cfg)
    assert final_rows(mor_replayed) == before


def test_reopen_recovers_mode(mor_replayed, spark):
    """create_target on an existing table must adopt the table's recorded
    write mode — never reinterpret MoR files under CoW (or vice versa)."""
    again = CdcPipeline.create_target(spark, mor_replayed.table.path)
    assert again.write_mode == "mor"
    assert again.final_state().count() == mor_replayed.final_state().count()


def test_mor_lww_and_late_events(spark, tmp_path):
    """Out-of-order (late) events lose at read time exactly as CoW: an
    older-cursor event appended AFTER a newer one must not win, and a
    tombstone beats older versions until something newer arrives."""
    pipe = CdcPipeline.create_target(spark, str(tmp_path / "p"), n_buckets=2, write_mode="mor")
    pipe.apply_batch(batch(spark, [ev("u://a", 10, 0, text="v1")]), "c0")
    pipe.apply_batch(batch(spark, [ev("u://a", 5, 1, text="late")]), "c1")  # late
    rows = {r["url"]: r["text"] for r in pipe.final_state().collect()}
    assert rows["u://a"] == "v1"
    # both versions are retained in the store until compaction
    assert pipe.table.read().count() == 2 and pipe.raw_state().count() == 1
    pipe.apply_batch(batch(spark, [ev("u://a", 20, 2, deleted=T)]), "c2")
    assert pipe.final_state().count() == 0
    pipe.apply_batch(batch(spark, [ev("u://a", 30, 3, text="v3")]), "c3")
    rows = {r["url"]: r["text"] for r in pipe.final_state().collect()}
    assert rows == {"u://a": "v3"}


def test_mor_expire_tombstones_no_resurrection(spark, tmp_path):
    """expire on a MoR pipe compacts first: dropping the tombstone must not
    resurrect an older stored version of the key."""
    pipe = CdcPipeline.create_target(spark, str(tmp_path / "p"), n_buckets=1, write_mode="mor")
    pipe.apply_batch(batch(spark, [ev("u://a", 1, 0, text="v1"), ev("u://b", 2, 0)]), "c0")
    pipe.apply_batch(batch(spark, [ev("u://a", 10, 1, deleted=T + dt.timedelta(minutes=10))]), "c1")
    assert pipe.final_state().count() == 1  # only u://b
    pipe.expire_tombstones(T + dt.timedelta(days=1))
    urls = {r["url"] for r in pipe.final_state().collect()}
    assert urls == {"u://b"}, "expired tombstone must not resurrect u://a"
    # and the raw store no longer carries the tombstone row
    assert pipe.raw_state().count() == 1
