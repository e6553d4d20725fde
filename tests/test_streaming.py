"""Structured Streaming path: tail a changelog directory with
readStream + foreachBatch + trigger(availableNow), verify the final table
equals the batch-replay result, and that a second stream run (same data,
fresh Spark checkpoint dir) is a no-op thanks to the engine's own
committed-checkpoint guard (exactly-once without trusting the Spark
checkpoint, ≡ reference state-commit protocol SURVEY §2.9)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.sources.changelog import read_changelog, write_changelog_dir
from airbyte_spark.streaming.pipeline import CdcPipeline

BATCH_SPAN = 200  # sf0.001: 1000 events → 5 checkpoint segments


@pytest.fixture(scope="module")
def changelog_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream") / "changelog")
    n = write_changelog_dir(spark, sf_dir, d, batch_span=BATCH_SPAN)
    assert n == 5
    return d


def test_stream_matches_batch_replay(spark, sf_dir, changelog_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream_lake")
    stream_pipe = CdcPipeline.create_target(spark, str(base / "stream"), n_buckets=4)
    stream_pipe.run_stream(
        changelog_dir,
        str(base / "ckpt"),
        available_now=True,
        max_files_per_trigger=2,
    )
    assert stream_pipe.committed_checkpoints() == [f"ckpt-{i}" for i in range(5)]

    batch_pipe = CdcPipeline.create_target(spark, str(base / "batch"), n_buckets=4)
    batch_pipe.replay(read_changelog(spark, sf_dir, batch_span=BATCH_SPAN))

    cols = ["url", "warc_ts", "text", "lang", "_ab_cdc_lsn"]
    got = sorted(tuple(r[c] for c in cols) for r in stream_pipe.final_state().collect())
    want = sorted(tuple(r[c] for c in cols) for r in batch_pipe.final_state().collect())
    assert got == want and len(got) > 0

    # Second run over the same directory with a FRESH Spark checkpoint:
    # Spark re-delivers every file, but the engine's committed set makes
    # every batch a no-op.
    v = stream_pipe.table.current_version()
    stream_pipe.run_stream(changelog_dir, str(base / "ckpt2"), available_now=True)
    assert stream_pipe.table.current_version() == v
    assert all(r.skipped for r in stream_pipe.results[5:])


def test_tx_assembler_streaming_atomicity(spark, changelog_dir, tmp_path_factory):
    """Streaming transaction assembly (stateful.tx_assembler): transactions
    of 3 lsns over 200-lsn segment files must span file boundaries; with
    one file per micro-batch, a spanning tx may only surface AFTER its last
    event's file — whole, in one epoch — and the final open tx (lsn 999)
    never surfaces."""
    from airbyte_spark.schema import CHANGE_SCHEMA
    from airbyte_spark.streaming.stateful import tx_assembler

    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("basePath", changelog_dir)
        .parquet(changelog_dir)
        .withColumn("tx_id", (F.col("_ab_cdc_lsn") / 3).cast("long"))
        .withColumn("tx_total", F.lit(3).cast("long"))
    )
    out = tx_assembler(stream)

    seen: list[tuple[int, int]] = []  # (epoch, lsn)

    def capture(df, epoch_id):
        seen.extend((int(epoch_id), int(r["_ab_cdc_lsn"])) for r in df.collect())

    ckpt = str(tmp_path_factory.mktemp("txasm") / "ckpt")
    q = (
        out.writeStream.foreachBatch(capture)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    lsns = sorted(l for _, l in seen)
    # every complete tx emitted exactly once; open tx 333 (lsn 999) withheld
    assert lsns == list(range(999))

    epoch_of = {l: e for e, l in seen}
    for tx in range(333):
        tx_lsns = [3 * tx, 3 * tx + 1, 3 * tx + 2]
        epochs = {epoch_of[l] for l in tx_lsns}
        assert len(epochs) == 1, f"tx {tx} torn across epochs {epochs}"
        # a tx must not appear before the file containing its LAST event
        assert min(epochs) >= max(tx_lsns) // 200, tx


def test_streaming_session_window_matches_batch_and_withholds_open(
    spark, sf_dir, tmp_path_factory
):
    """streaming_session_stats (built-in session_window + watermark) in
    append mode: sessions the advancing watermark has closed are emitted
    exactly once and match the batch sessionizer's rollups (end differs by
    exactly the gap, by definition of session_window); sessions still open
    against the final watermark are withheld.

    Runs under a NON-UTC session timezone: the NTZ→timestamp watermark
    cast plus the NTZ cast-back on the emitted bounds must round-trip, so
    streaming equals the batch NTZ oracle in any session zone."""
    import datetime as dt

    from airbyte_spark.operators.temporal import session_stats
    from airbyte_spark.streaming.windows import streaming_session_stats

    gap = 1800
    base = dt.datetime(2024, 1, 1)
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")

    def ev(uid, minute, eid):
        return (eid, base + dt.timedelta(minutes=minute), uid)

    # user 1: two sessions (gap > 30 min between them); user 2: one session
    # far in the past (closes) and one at the stream head (stays open)
    early = [
        ev(1, 0, 0), ev(1, 10, 1), ev(1, 20, 2),   # session A
        ev(1, 100, 3), ev(1, 115, 4),              # session B
        ev(2, 5, 5), ev(2, 25, 6),                 # session C
    ]
    late = [ev(2, 3000, 7), ev(2, 3010, 8)]        # session D: at the head
    d = str(tmp_path_factory.mktemp("sess") / "in")
    schema = "event_id long, ts timestamp_ntz, user_id long"
    spark.createDataFrame(early, schema).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(late, schema).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = streaming_session_stats(stream, "user_id", "ts", gap,
                                  watermark_delay="1 minute")
    rows = []

    def capture(df, epoch_id):
        rows.extend(df.collect())

    ckpt = str(tmp_path_factory.mktemp("sess") / "ckpt")
    try:
        q = (
            out.writeStream.outputMode("append").foreachBatch(capture)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    # emitted bounds are timestamp_ntz, matching the batch oracle schema
    assert out.schema["session_start"].dataType.typeName() == "timestamp_ntz"
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in rows
    )
    # batch oracle over the CLOSED sessions (watermark at head - 1 min
    # closes A, B, C; D is open: last event + gap > watermark)
    batch = session_stats(
        spark.createDataFrame(early, schema), "user_id", "ts", gap,
        order_tiebreak="event_id",
    ).collect()
    want = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in batch
    )
    assert got == want and len(got) == 3, (got, want)
    # and every emitted end = its batch session_end + gap (session_window
    # semantics), so the two definitions reconcile exactly
    ends = {(r["user_id"], r["session_start"]): r["session_end"] for r in rows}
    for r in batch:
        k = (r["user_id"], r["session_start"])
        assert ends[k] == r["session_end"] + dt.timedelta(seconds=gap), k
