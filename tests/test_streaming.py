"""Structured Streaming path: tail a changelog directory with
readStream + foreachBatch + trigger(availableNow), verify the final table
equals the batch-replay result, and that a second stream run (same data,
fresh Spark checkpoint dir) is a no-op thanks to the engine's own
committed-checkpoint guard (exactly-once without trusting the Spark
checkpoint, ≡ reference state-commit protocol SURVEY §2.9)."""

from __future__ import annotations

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
