"""Sync scheduler: jobs/attempts bookkeeping + retry-with-backoff
(≡ SyncWorkflowImpl.java:52-92 attempt loop over the engine's
checkpoint-transactional sync)."""

from __future__ import annotations

import pyspark.sql.functions as F

from airbyte_spark.catalog import ConfiguredStream, SyncCatalog
from airbyte_spark.protocol import StreamConfig
from airbyte_spark.scheduler import (
    attempts_df,
    run_sync_loop,
    run_sync_with_retries,
)
from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.sources.registry import synthetic_changelog_source
from airbyte_spark.streaming.pipeline import CdcPipeline, default_target_schema


def _catalog(sf_dir, tmp_path):
    return SyncCatalog(
        streams=[
            ConfiguredStream(
                cfg=StreamConfig(name="pages", schema=default_target_schema()),
                source=synthetic_changelog_source(sf_dir, batch_span=500),
                target_path=str(tmp_path / "pages"),
                n_buckets=4,
            )
        ]
    )


def test_failed_attempt_retries_to_exactly_once_state(spark, sf_dir, tmp_path):
    """Inject a crash AFTER the first sync attempt has committed some
    checkpoints: the retry must (a) be recorded as attempt 2, (b) skip
    everything attempt 1 committed, (c) land the identical final state as
    a never-failed sync."""
    from airbyte_spark.catalog import sync as real_sync

    cat = _catalog(sf_dir, tmp_path)
    log = str(tmp_path / "attempts.jsonl")
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            # run PART of the sync for real (commits real checkpoints),
            # then die — the mid-sync transient failure shape
            pipe = CdcPipeline.create_target(
                spark, str(tmp_path / "pages"), n_buckets=4
            )
            ch = read_changelog(spark, sf_dir, batch_span=500)
            pipe.replay(ch.filter(F.col("checkpoint_id") < 3))
            raise TimeoutError("source connection dropped")
        return real_sync(spark, cat)

    slept = []
    out = run_sync_with_retries(
        spark, cat, log, job_id="j1", sync_fn=flaky,
        backoff_s=1.5, sleep=slept.append,
    )
    assert out["status"] == "succeeded" and out["attempts"] == 2
    assert slept == [1.5]  # backoff between attempt 1 and 2

    rows = {r["attempt"]: r for r in attempts_df(spark, log).collect()}
    assert rows[1]["status"] == "failed" and "TimeoutError" in rows[1]["error"]
    assert rows[2]["status"] == "succeeded" and rows[2]["error"] is None
    assert rows[2]["records"] is not None

    # exactly-once: equal to a clean single-attempt sync on fresh state
    clean = _catalog(sf_dir, tmp_path / "clean")
    run_sync_with_retries(spark, clean, str(tmp_path / "a2.jsonl"), job_id="j2")
    got = CdcPipeline.create_target(spark, str(tmp_path / "pages")).final_state()
    want = CdcPipeline.create_target(
        spark, str(tmp_path / "clean" / "pages")
    ).final_state()
    k = ["url", "warc_ts", "_ab_cdc_lsn"]
    assert sorted(map(tuple, got.select(k).collect())) == sorted(
        map(tuple, want.select(k).collect())
    )


def test_retry_budget_exhaustion_records_every_attempt(spark, sf_dir, tmp_path):
    cat = _catalog(sf_dir, tmp_path)
    log = str(tmp_path / "attempts.jsonl")

    def always_fails():
        raise ConnectionError("boom")

    slept = []
    out = run_sync_with_retries(
        spark, cat, log, job_id="j1", sync_fn=always_fails,
        max_attempts=3, backoff_s=1.0, backoff_factor=3.0, sleep=slept.append,
    )
    assert out["status"] == "failed" and out["attempts"] == 3
    assert "ConnectionError" in out["error"]
    assert slept == [1.0, 3.0]  # geometric, none after the final attempt
    a = attempts_df(spark, log)
    assert a.count() == 3
    assert a.filter("status = 'failed'").count() == 3


def test_sync_loop_runs_n_jobs_and_second_is_incremental_noop(
    spark, sf_dir, tmp_path
):
    cat = _catalog(sf_dir, tmp_path)
    log = str(tmp_path / "attempts.jsonl")
    jobs = run_sync_loop(spark, cat, log, runs=2)
    assert [j["status"] for j in jobs] == ["succeeded", "succeeded"]
    # per-invocation clock prefix + loop index: unique ids, shared prefix
    ids = [j["job_id"] for j in jobs]
    assert len(set(ids)) == 2
    assert ids[0].endswith("-0") and ids[1].endswith("-1")
    assert ids[0].rsplit("-", 1)[0] == ids[1].rsplit("-", 1)[0]
    # all checkpoints committed by the first job → the second applies zero
    assert jobs[0]["records"] > 0 and jobs[1]["records"] == 0
    a = attempts_df(spark, log).orderBy("started_at").collect()
    assert [r["job_id"] for r in a] == ids
    # a SECOND loop invocation over the same log must not collide ids
    jobs2 = run_sync_loop(spark, cat, log, runs=1)
    assert jobs2[0]["job_id"] not in ids
