"""Property-based confluence: any batching/permutation of the same change
events must converge to the same final table (the LWW/dedup replay-
equivalence invariant — our north-rule analog of the reference's
duplicate-tolerance + dedup contract, CdcSourceTest.java:421-432)."""

from __future__ import annotations

import datetime as dt
import random

import pyspark.sql.functions as F
import pytest

from airbyte_spark.protocol import StreamConfig
from airbyte_spark.schema import CHANGE_SCHEMA
from airbyte_spark.streaming.pipeline import CdcPipeline


def gen_events(rng: random.Random, n_urls=8, n_events=60):
    base = dt.datetime(2024, 1, 1)
    events = []
    for lsn in range(n_events):
        u = f"u{rng.randrange(n_urls)}"
        ts = base + dt.timedelta(minutes=rng.randrange(50))  # deliberate ts ties
        deleted = ts if rng.random() < 0.25 else None
        events.append((u, ts, None, f"text-{lsn}", "en", ts, deleted, lsn, ts, 0))
    return events


def final_of(spark, tmp_path, name, batches, write_mode="cow"):
    pipe = CdcPipeline.create_target(
        spark, str(tmp_path / name), n_buckets=4, write_mode=write_mode
    )
    for i, rows in enumerate(batches):
        if not rows:
            continue
        df = spark.createDataFrame(
            [r[:9] + (i,) for r in rows], CHANGE_SCHEMA
        )  # restamp checkpoint_id
        pipe.apply_batch(df, f"ckpt-{i}")
    return sorted(
        (r["url"], r["warc_ts"], r["_ab_cdc_lsn"], r["text"])
        for r in pipe.final_state().collect()
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batching_confluence(spark, tmp_path, seed):
    """One-shot, per-10 batches, and a shuffled 3-way split all converge.

    Batches must respect the invariant real binlog segments have: a later
    segment never contains an event older (by lsn) than a committed one's
    max — but WITHIN a batch order is arbitrary, and duplicate delivery
    across batch boundaries is allowed (at-least-once upstream).
    """
    rng = random.Random(seed)
    events = gen_events(rng)

    one_shot = final_of(spark, tmp_path, f"a{seed}", [events])

    chunks = [events[i : i + 10] for i in range(0, len(events), 10)]
    # duplicate a boundary event into the next chunk (at-least-once redelivery)
    for i in range(1, len(chunks)):
        chunks[i] = [chunks[i - 1][-1]] + chunks[i]
    # shuffle order *within* each chunk
    for c in chunks:
        rng.shuffle(c)
    chunked = final_of(spark, tmp_path, f"b{seed}", chunks)

    assert one_shot == chunked
    assert len(one_shot) > 0

    # merge-on-read is confluent with copy-on-write on the SAME chunking:
    # append-winners + read-time resolve must land on the identical state
    mor = final_of(spark, tmp_path, f"m{seed}", chunks, write_mode="mor")
    assert mor == one_shot


def test_tombstone_expiry(spark, tmp_path):
    """expire_tombstones GCs soft-deletes older than the watermark but keeps
    newer ones; files with no tombstones are not rewritten."""
    t = dt.datetime(2024, 1, 1)
    t_new = dt.datetime(2024, 2, 1)
    pipe = CdcPipeline.create_target(spark, str(tmp_path / "exp"), n_buckets=2)
    rows = [
        ("live", t, None, "x", "en", t, None, 1, t, 0),
        ("old-dead", t, None, None, "en", t, t, 2, t, 0),
        ("new-dead", t_new, None, None, "en", t_new, t_new, 3, t_new, 0),
    ]
    pipe.apply_batch(spark.createDataFrame(rows, CHANGE_SCHEMA), "ckpt-0")
    assert pipe.raw_state().count() == 3
    pipe.expire_tombstones(watermark=dt.datetime(2024, 1, 15))
    kept = {r["url"] for r in pipe.raw_state().collect()}
    assert kept == {"live", "new-dead"}
    assert {r["url"] for r in pipe.final_state().collect()} == {"live"}
    # idempotent: nothing left to expire → version unchanged
    v = pipe.table.current_version()
    pipe.expire_tombstones(watermark=dt.datetime(2024, 1, 15))
    assert pipe.table.current_version() == v


def test_lww_ties_resolved_by_lsn_globally(spark, tmp_path):
    """Two events with identical warc_ts in *different* batches: the higher
    LSN must win no matter the batch split (total order)."""
    t = dt.datetime(2024, 1, 1)
    e1 = ("u", t, None, "first", "en", t, None, 1, t, 0)
    e2 = ("u", t, None, "second", "en", t, None, 2, t, 0)
    split = final_of(spark, tmp_path, "s1", [[e1], [e2]])
    merged = final_of(spark, tmp_path, "s2", [[e1, e2]])
    assert split == merged == [("u", t, 2, "second")]
