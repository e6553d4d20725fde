"""Event-time windowed metrics (watermark semantics) and the
applyInPandasWithState redelivery filter.

Covers the Structured Streaming surface beyond foreachBatch replay:
  - batch/streaming parity of the shared windowed-metrics plan,
  - late events folding into their event-time window (not arrival window),
  - watermark actually DROPPING events later than the allowed lateness and
    finalizing (append-emitting) closed windows,
  - cross-batch per-key high-water-mark state: an exact redelivery of a
    prior micro-batch yields zero rows; within-batch duplicate lsns are
    screened by the running mark.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from airbyte_spark.schema import CHANGE_SCHEMA
from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.streaming.stateful import redelivery_filter
from airbyte_spark.streaming.windows import windowed_event_metrics


def _mk_events(spark, rows):
    """rows: (url, ts, lsn, deleted) → CHANGE_SCHEMA DataFrame."""
    data = [
        (
            url,
            ts,
            None,
            None,
            "en",
            ts,
            ts if deleted else None,
            lsn,
            ts,
            0,
        )
        for (url, ts, lsn, deleted) in rows
    ]
    return spark.createDataFrame(data, CHANGE_SCHEMA)


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


# --- windowed metrics: batch form ------------------------------------------------


def test_windowed_metrics_batch_totals(spark, sf_dir):
    ch = read_changelog(spark, sf_dir)
    m = windowed_event_metrics(ch, "1 hour").cache()
    agg = m.agg(
        F.sum("n_events").alias("e"),
        F.sum("n_deletes").alias("d"),
        F.max("max_lsn").alias("mx"),
    ).first()
    total = ch.count()
    deletes = ch.filter(F.col("_ab_cdc_deleted_at").isNotNull()).count()
    assert agg["e"] == total and agg["d"] == deletes
    assert agg["mx"] == ch.agg(F.max("_ab_cdc_lsn")).first()[0]
    # windows align to the hour and n_urls never exceeds n_events
    bad = m.filter(
        (F.minute("window_start") != 0)
        | (F.second("window_start") != 0)
        | (F.col("n_urls") > F.col("n_events"))
    ).count()
    assert bad == 0
    m.unpersist()


# --- windowed metrics: streaming with watermark ----------------------------------


@pytest.fixture()
def seg_dir(tmp_path):
    return str(tmp_path / "segs")


def _write_seg(df, seg_dir, name):
    """One plain parquet file per segment (file-source trigger unit),
    mtime-ordered by write order."""
    import glob
    import os
    import shutil

    tmp = f"{seg_dir}/_tmp_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, f"{seg_dir}/{name}.parquet")
    shutil.rmtree(tmp)
    os.utime(f"{seg_dir}/{name}.parquet")


def test_streaming_late_event_folds_into_its_window(spark, seg_dir, tmp_path):
    # trigger 1: events in hour-0 and hour-1; trigger 2: a LATE hour-0 event
    # still inside the allowed lateness → must fold into the hour-0 window.
    _write_seg(
        _mk_events(
            spark,
            [("u1", _t(10), 1, False), ("u2", _t(70), 2, False)],
        ),
        seg_dir,
        "s0",
    )
    _write_seg(
        _mk_events(spark, [("u3", _t(20), 3, False)]),  # late, within 2h
        seg_dir,
        "s1",
    )
    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seg_dir)
    )
    q = (
        windowed_event_metrics(stream, "1 hour", watermark_delay="2 hours")
        .writeStream.format("memory")
        .queryName("winfold")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["window_start"]: (r["n_events"], r["n_urls"])
        for r in spark.table("winfold").collect()
    }
    assert got[T0] == (2, 2)  # hour-0 holds u1 + late u3
    assert got[_t(60)] == (1, 1)


def test_streaming_watermark_drops_too_late_and_finalizes(spark, seg_dir, tmp_path):
    # trigger 1 pushes event time to 02:00 → watermark 01:50 takes effect in
    # trigger 2, which closes (evicts + append-emits) the hour-0 window.
    # trigger 3 then redelivers an hour-0 event: Spark's late-event filter
    # uses the PREVIOUS batch's watermark (watermarkForLateEvents), so only
    # now — one batch after eviction — is it genuinely too late → dropped.
    _write_seg(
        _mk_events(
            spark,
            [
                ("u1", _t(5), 1, False),
                ("u2", _t(30), 2, True),
                ("hw", _t(120), 3, False),  # pushes event-time high-water mark
            ],
        ),
        seg_dir,
        "s0",
    )
    _write_seg(
        _mk_events(spark, [("adv", _t(125), 4, False)]),
        seg_dir,
        "s1",
    )
    _write_seg(
        _mk_events(
            spark,
            [("u9", _t(31), 5, False), ("u8", _t(130), 6, False)],
        ),
        seg_dir,
        "s2",
    )
    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seg_dir)
    )
    q = (
        windowed_event_metrics(stream, "1 hour", watermark_delay="10 minutes")
        .writeStream.format("memory")
        .queryName("winfinal")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    all_rows = spark.table("winfinal").collect()
    rows = {r["window_start"]: r for r in all_rows}
    # hour-0 finalized exactly once, with the ON-TIME rows only; the
    # redelivered u9 was behind the closed window's watermark → dropped
    # (no duplicate hour-0 emission either)
    assert len(all_rows) == len(rows)
    assert T0 in rows
    assert rows[T0]["n_events"] == 2 and rows[T0]["n_deletes"] == 1
    # hour-2 window never closed (watermark stops at 02:20) → not emitted
    assert _t(120) not in rows


# --- applyInPandasWithState redelivery filter ------------------------------------


def test_redelivery_filter_cross_batch_and_within_batch(spark, seg_dir, tmp_path):
    # batch 0: lsn 1..4 across two keys, plus a within-batch duplicate lsn
    # batch 1: exact redelivery of batch 0 + genuinely-new lsn 5 and 6
    b0 = [
        ("a", _t(1), 1, False),
        ("a", _t(1), 1, False),  # duplicate within the batch → screened
        ("b", _t(2), 2, False),
        ("a", _t(3), 3, False),
        ("b", _t(4), 4, True),
    ]
    b1 = b0 + [("a", _t(5), 5, False), ("b", _t(6), 6, False)]
    _write_seg(_mk_events(spark, b0), seg_dir, "s0")
    _write_seg(_mk_events(spark, b1), seg_dir, "s1")
    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seg_dir)
    )
    q = (
        redelivery_filter(stream, key_cols=["url"])
        .writeStream.format("memory")
        .queryName("redeliv")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("redeliv").select("url", "_ab_cdc_lsn").collect()
    got = sorted((r["url"], r["_ab_cdc_lsn"]) for r in out)
    # each lsn exactly once: batch-0 events once, redelivery contributes
    # nothing, the two new events pass
    assert got == [("a", 1), ("a", 3), ("a", 5), ("b", 2), ("b", 4), ("b", 6)]
