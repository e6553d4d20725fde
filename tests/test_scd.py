"""SCD2 history operator tests: one-shot window form vs incremental
append form must agree (the reference's full-rebuild vs incremental dbt
runs produce identical SCD tables)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from airbyte_spark.operators.scd import scd_append_batch, scd_history
from airbyte_spark.protocol import StreamConfig
from airbyte_spark.schema import CHANGE_SCHEMA

T = [dt.datetime(2024, 1, 1 + i) for i in range(6)]


def ev(url, ts, lsn, deleted=None):
    return (url, ts, None, f"t{lsn}", "en", ts, deleted, lsn, ts, 0)


@pytest.fixture(scope="module")
def cfg():
    return StreamConfig(name="pages", schema=CHANGE_SCHEMA)


def rows_of(df):
    return sorted(
        (r["url"], r["_start_at"], r["_end_at"], r["_active_row"], r["_ab_cdc_lsn"])
        for r in df.select("url", "_start_at", "_end_at", "_active_row", "_ab_cdc_lsn").collect()
    )


def test_scd_history_intervals(spark, cfg):
    events = [ev("u1", T[0], 1), ev("u1", T[1], 2), ev("u1", T[2], 3, deleted=T[2]), ev("u2", T[0], 4)]
    df = spark.createDataFrame(events, CHANGE_SCHEMA)
    got = rows_of(scd_history(df, cfg))
    assert got == [
        ("u1", T[0], T[1], False, 1),
        ("u1", T[1], T[2], False, 2),
        ("u1", T[2], None, False, 3),  # tombstone: newest but never active
        ("u2", T[0], None, True, 4),
    ]


def test_incremental_scd_matches_one_shot(spark, cfg):
    all_events = [
        ev("u1", T[0], 1),
        ev("u1", T[2], 3),
        ev("u2", T[1], 2),
        ev("u1", T[3], 4, deleted=T[3]),
        ev("u2", T[4], 5),
    ]
    full = spark.createDataFrame(all_events, CHANGE_SCHEMA)
    want = rows_of(scd_history(full, cfg))

    b1 = spark.createDataFrame(all_events[:3], CHANGE_SCHEMA)
    b2 = spark.createDataFrame(all_events[3:], CHANGE_SCHEMA)
    scd1 = scd_history(b1, cfg)
    scd2 = scd_append_batch(scd1, b2, cfg)
    assert rows_of(scd2) == want
