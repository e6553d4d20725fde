"""Unit tests for the MERGE resolve cases — the reference's SCD active-row
matrix (stream_processor.py:695-768; CdcSourceTest testDelete/testUpdate)
exercised directly on resolve_merge without a lake table."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.merge import resolve_merge
from airbyte_spark.protocol import StreamConfig
from airbyte_spark.schema import CHANGE_SCHEMA

OUT_COLS = ["url", "warc_ts", "html", "text", "lang", "_ab_cdc_lsn", "_ab_cdc_deleted_at"]

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 2)
T2 = dt.datetime(2024, 1, 3)


def chrow(url, ts, lsn, ckpt=0, deleted=None, text=None):
    return (url, ts, None, text, "en", ts, deleted, lsn, ts, ckpt)


@pytest.fixture(scope="module")
def cfg():
    return StreamConfig(name="pages", schema=CHANGE_SCHEMA)


@pytest.fixture(scope="module")
def mk(spark):
    def make(rows, schema=CHANGE_SCHEMA):
        return spark.createDataFrame(rows, schema)

    return make


def target_rows(spark, rows):
    """Existing-table frame: payload + lsn + soft-delete marker."""
    schema = (
        "url string, warc_ts timestamp_ntz, html binary, text string, lang string, "
        "_ab_cdc_lsn long, _ab_cdc_deleted_at timestamp_ntz"
    )
    return spark.createDataFrame(rows, schema)


def resolve(spark, existing_rows, batch_rows, cfg):
    """Returns (active, tombstoned) key→value maps — the merge keeps
    tombstones as soft-delete rows; the active view filters them."""
    existing = target_rows(spark, existing_rows)
    batch = spark.createDataFrame(batch_rows, CHANGE_SCHEMA)
    out = resolve_merge(existing, batch, cfg, OUT_COLS).collect()
    active = {
        r["url"]: (r["warc_ts"], r["_ab_cdc_lsn"], r["text"])
        for r in out
        if r["_ab_cdc_deleted_at"] is None
    }
    dead = {r["url"] for r in out if r["_ab_cdc_deleted_at"] is not None}
    return active, dead


def test_insert_update_delete_matrix(spark, cfg):
    existing = [
        ("u1", T0, None, "old1", "en", 1, None),  # updated (newer batch row)
        ("u2", T0, None, "old2", "en", 2, None),  # deleted (newer tombstone)
        ("u3", T2, None, "old3", "en", 3, None),  # late batch event must NOT win
    ]
    batch = [
        chrow("u1", T1, 10, text="new1"),
        chrow("u2", T1, 11, deleted=T1),
        chrow("u3", T1, 12, text="late"),  # older than existing T2
        chrow("u4", T1, 13, text="ins4"),  # fresh insert
        chrow("u5", T1, 14, deleted=T1),  # delete of unseen key → tombstone row
    ]
    active, dead = resolve(spark, existing, batch, cfg)
    assert active == {
        "u1": (T1, 10, "new1"),
        "u3": (T2, 3, "old3"),
        "u4": (T1, 13, "ins4"),
    }
    assert dead == {"u2", "u5"}


def test_delete_then_reinsert_within_batch(spark, cfg):
    """The tombstone is NOT the latest event → the reinsert wins
    (≡ cdc_active_row_pattern, stream_processor.py:759-768)."""
    batch = [
        chrow("u1", T0, 1, text="v1"),
        chrow("u1", T1, 2, deleted=T1),
        chrow("u1", T2, 3, text="v3"),
    ]
    active, dead = resolve(spark, [], batch, cfg)
    assert active == {"u1": (T2, 3, "v3")}
    assert dead == set()


def test_reinsert_then_delete_within_batch(spark, cfg):
    batch = [
        chrow("u1", T0, 1, text="v1"),
        chrow("u1", T2, 3, deleted=T2),
        chrow("u1", T1, 2, text="v2"),
    ]
    active, dead = resolve(spark, [("u1", T0, None, "old", "en", 0, None)], batch, cfg)
    assert active == {}
    assert dead == {"u1"}


def test_stored_tombstone_beats_late_insert(spark, cfg):
    """The confluence fix: a persisted tombstone (newer cursor) must win
    against a late out-of-order insert arriving in a later batch."""
    existing = [("u1", T2, None, None, "en", 9, T2)]  # stored soft-delete @ T2
    batch = [chrow("u1", T1, 4, text="late-insert")]
    active, dead = resolve(spark, existing, batch, cfg)
    assert active == {}
    assert dead == {"u1"}


def test_cursor_tie_broken_by_lsn(spark, cfg):
    batch = [chrow("u1", T1, 5, text="lsn5"), chrow("u1", T1, 9, text="lsn9")]
    active, _ = resolve(spark, [], batch, cfg)
    assert active == {"u1": (T1, 9, "lsn9")}


def test_exact_redelivery_is_noop(spark, cfg):
    """Batch row identical to the stored row (same warc_ts+lsn): batch wins
    the tie, producing the same image — idempotent redelivery."""
    existing = [("u1", T1, None, "stored", "en", 7, None)]
    batch = [chrow("u1", T1, 7, text="stored")]
    active, dead = resolve(spark, existing, batch, cfg)
    assert active == {"u1": (T1, 7, "stored")}
    assert dead == set()


def test_null_cursor_sorts_last(spark, cfg):
    """desc_nulls_last ≡ reference 'cursor IS NULL ASC, cursor DESC'."""
    from pyspark.sql.types import StructField, StructType

    nullable = StructType(
        [StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA.fields]
    )
    batch_df = spark.createDataFrame(
        [chrow("u1", None, 99, text="nullts"), chrow("u1", T0, 1, text="real")], nullable
    )
    existing = target_rows(spark, [])
    out = resolve_merge(existing, batch_df, cfg, OUT_COLS)
    got = {r["url"]: (r["warc_ts"], r["_ab_cdc_lsn"], r["text"]) for r in out.collect()}
    assert got == {"u1": (T0, 1, "real")}
