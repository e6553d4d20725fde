"""Transaction-boundary semantics (sources/transactions.py): complete-tx
detection, batch splitting, and transaction-atomic lake replay — a commit
must never publish a torn source transaction."""

from __future__ import annotations

import datetime as dt
import tempfile

import pyspark.sql.functions as F
import pytest

from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.sources.transactions import (
    complete_tx_ids,
    replay_transactional,
    split_transactions,
)


def ev(url, day, lsn, tx, total, ckpt=0):
    ts = dt.datetime(2024, 1, day)
    return (url, ts, None, None, "en", ts, None, lsn, ts, ckpt, tx, total)


SCHEMA = (
    "url string, warc_ts timestamp_ntz, html binary, text string, lang string, "
    "_ab_cdc_updated_at timestamp_ntz, _ab_cdc_deleted_at timestamp_ntz, "
    "_ab_cdc_lsn long, _emitted_at timestamp_ntz, checkpoint_id long, "
    "tx_id long, tx_total int"
)


def test_split_defers_incomplete_transactions(spark):
    rows = [
        ev("a", 1, 1, tx=100, total=2),
        ev("b", 1, 2, tx=100, total=2),   # tx 100 complete
        ev("c", 1, 3, tx=200, total=3),
        ev("d", 1, 4, tx=200, total=3),   # tx 200: 2 of 3 → deferred
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    ready, deferred = split_transactions(df)
    assert {r["url"] for r in ready.collect()} == {"a", "b"}
    assert {r["url"] for r in deferred.collect()} == {"c", "d"}


def test_complete_tx_ids_respects_prefix(spark):
    rows = [
        ev("a", 1, 1, tx=1, total=2),
        ev("b", 1, 5, tx=1, total=2),  # completes at lsn 5
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    assert complete_tx_ids(df, upto_lsn=4).count() == 0
    got = complete_tx_ids(df, upto_lsn=5).collect()
    assert [(r["tx_id"], r["tx_end_lsn"]) for r in got] == [(1, 5)]


def test_replay_transactional_never_tears(spark):
    """Transactions of 3 events over 1000-lsn segments MUST span segment
    boundaries (1000 % 3 != 0). Atomicity: replaying only segment 0
    withholds the spanning tx entirely; finishing the replay applies it
    under the next segment's key, and txn-0 is skipped idempotently.
    Needs multiple segments → sf0.01 (the default test fixture has one)."""
    from airbyte_spark.streaming.pipeline import CdcPipeline

    ch = (
        read_changelog(spark, "/root/testdata/sf0.01")
        .withColumn("tx_id", (F.col("_ab_cdc_lsn") / 3).cast("long"))
        .withColumn("tx_total", F.lit(3))
    )
    max_lsn = ch.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    segs = sorted(r[0] for r in ch.select("checkpoint_id").distinct().collect())
    if len(segs) < 2:
        pytest.skip("fixture has a single segment")

    root = tempfile.mkdtemp(prefix="txn_replay_")
    pipe = CdcPipeline.create_target(spark, root + "/t", n_buckets=4)

    # phase 1: only segment 0 visible
    part = ch.filter(F.col("checkpoint_id") == segs[0])
    replay_transactional(pipe, part)
    state1 = {r["url"]: r["_ab_cdc_lsn"] for r in pipe.final_state().collect()}
    boundary_tx = (segs[0] * 1000 + 999) // 3  # tx spanning seg 0 → 1
    spanning_lsns = {boundary_tx * 3, boundary_tx * 3 + 1, boundary_tx * 3 + 2}
    assert not (set(state1.values()) & spanning_lsns), "torn transaction published"

    # phase 2: full log — txn-0 must skip, the rest applies
    results = replay_transactional(pipe, ch)
    skipped = {r.checkpoint_key for r in results if r.skipped}
    assert f"txn-{segs[0]}" in skipped

    # equality with the complete-tx LWW definition over the whole log
    from pyspark.sql import Window

    last_complete = (max_lsn + 1) // 3 * 3 - 1  # last lsn of last full tx
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.col("_ab_cdc_lsn").desc()
    )
    want_df = (
        ch.filter(F.col("_ab_cdc_lsn") <= last_complete)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & F.col("_ab_cdc_deleted_at").isNull())
    )
    want = {r["url"]: r["_ab_cdc_lsn"] for r in want_df.collect()}
    got = {r["url"]: r["_ab_cdc_lsn"] for r in pipe.final_state().collect()}
    assert got == want
