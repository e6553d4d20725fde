"""Sync orchestration: job/attempt bookkeeping with retry-and-backoff.

Parity: the reference wraps every sync in a workflow that tracks a job
with numbered attempts, retrying failed attempts with backoff and
recording per-attempt status/records/failure (airbyte-workers/.../
SyncWorkflowImpl.java:52-92 + the jobs/attempts tables of its config
store). That scheduler is Temporal-shaped; here it is a plain driver-side
loop — the distributed work stays inside `catalog.sync`, and the
engine's table-transactional checkpointing is what makes a retry safe:
a failed attempt's committed checkpoints are skipped by the next attempt
(exactly-once), so "retry" is literally "run the sync again".

Attempt rows append to a JSONL log (one writer — the driver — so a plain
append is atomic enough; the log is metadata-sized: one row per attempt,
never per record). `attempts_df` reads it back as a DataFrame for
inspection/monitoring queries; the CLI `sync --max-attempts/--loop` verbs
drive it.

Cron/trigger seam: the reference's schedule-driven triggering
(airbyte-scheduler's job creation + Temporal cron workflows) maps to
WHATEVER fires the driver in deployment — a cron entry, an Airflow/
Dagster task, or a Temporal cron workflow invoking `spark-submit cli.py
sync`. `run_sync_loop(runs=N, interval_s=S)` is that trigger's bounded
in-process shape (one tick ≡ one scheduled job); nothing in the engine
assumes an always-on scheduler process, because every piece of cross-run
state a trigger needs (cursor checkpoints, attempt history) lives in the
lake table and the attempts log, not in scheduler memory.
"""

from __future__ import annotations

import json
import os
import time
import traceback

from pyspark.sql import DataFrame, SparkSession

ATTEMPTS_SCHEMA = (
    "job_id string, attempt int, status string, started_at double, "
    "ended_at double, records bigint, streams int, error string"
)


def _append_attempt(log_path: str, row: dict) -> None:
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    with open(log_path, "a") as fh:
        fh.write(json.dumps(row) + "\n")
        fh.flush()
        os.fsync(fh.fileno())  # a crash right after a sync must not lose
        # or tear the attempt row the next scheduler run reasons from


def _records_of(results: list[dict]) -> int:
    return sum(int(r.get("rows") or 0) for r in results)


def run_sync_with_retries(
    spark: SparkSession,
    catalog,
    attempts_log: str,
    job_id: str | None = None,
    max_attempts: int = 3,
    backoff_s: float = 2.0,
    backoff_factor: float = 2.0,
    atomic: bool = False,
    txn_log_dir: str | None = None,
    sync_fn=None,
    sleep=time.sleep,
    clock=time.time,
) -> dict:
    """One JOB = up to max_attempts ATTEMPTS of `catalog.sync`. Returns
    {job_id, status, attempts, records, results?|error}. Each attempt
    appends one row to attempts_log regardless of outcome; backoff grows
    geometrically between attempts (≡ the reference's retry policy).
    `sync_fn`/`sleep`/`clock` are injectable for failure-injection tests.
    """
    from airbyte_spark.catalog import sync as _sync

    run = sync_fn or (
        lambda: _sync(spark, catalog, atomic=atomic, txn_log_dir=txn_log_dir)
    )
    job_id = job_id or f"job-{int(clock() * 1000)}"
    delay = backoff_s
    last_err = None
    for attempt in range(1, max_attempts + 1):
        started = clock()
        try:
            results = run()
        except Exception as ex:  # noqa: BLE001 — the attempt row carries it
            last_err = f"{type(ex).__name__}: {ex}"
            _append_attempt(
                attempts_log,
                {
                    "job_id": job_id,
                    "attempt": attempt,
                    "status": "failed",
                    "started_at": started,
                    "ended_at": clock(),
                    "records": None,
                    "streams": None,
                    "error": last_err,
                    "trace": traceback.format_exc(limit=5),
                },
            )
            if attempt < max_attempts:
                sleep(delay)
                delay *= backoff_factor
            continue
        _append_attempt(
            attempts_log,
            {
                "job_id": job_id,
                "attempt": attempt,
                "status": "succeeded",
                "started_at": started,
                "ended_at": clock(),
                "records": _records_of(results),
                "streams": len(results),
                "error": None,
            },
        )
        return {
            "job_id": job_id,
            "status": "succeeded",
            "attempts": attempt,
            "records": _records_of(results),
            "results": results,
        }
    return {
        "job_id": job_id,
        "status": "failed",
        "attempts": max_attempts,
        "error": last_err,
    }


def run_sync_loop(
    spark: SparkSession,
    catalog,
    attempts_log: str,
    runs: int,
    interval_s: float = 0.0,
    sleep=time.sleep,
    **kw,
) -> list[dict]:
    """`runs` scheduled jobs back-to-back (the reference's scheduler cron,
    bounded instead of infinite so CLI/test invocations terminate); each
    job gets its own id and retry budget. Incremental streams naturally
    pick up from their last committed checkpoint, so an idle tick is a
    cheap no-op sync. Job ids carry a per-invocation clock prefix so two
    loops appending to the same attempts log never collide under
    'job-0'."""
    clock = kw.get("clock", time.time)
    prefix = f"job-{int(clock() * 1000)}"
    out = []
    for i in range(runs):
        out.append(
            run_sync_with_retries(
                spark, catalog, attempts_log, job_id=f"{prefix}-{i}", **kw
            )
        )
        if interval_s and i + 1 < runs:
            sleep(interval_s)
    return out


def attempts_df(spark: SparkSession, attempts_log: str) -> DataFrame:
    """The attempts log as a typed DataFrame (jobs/attempts table read)."""
    return spark.read.schema(ATTEMPTS_SCHEMA).json(attempts_log)
