"""Replay-consistency audit (lake/audit.py) against a real lake table:
consistent after full replay, divergent when frozen mid-log, and able to
catch out-of-band corruption (a row deleted behind the log's back)."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.audit import audit_replay
from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.streaming.pipeline import CdcPipeline


@pytest.fixture(scope="module")
def replayed(spark, sf_dir):
    path = tempfile.mkdtemp(prefix="audit_lake_") + "/pages"
    pipe = CdcPipeline.create_target(spark, path, n_buckets=4)
    pipe.replay(read_changelog(spark, sf_dir))
    return pipe


def test_consistent_table_audits_clean(spark, sf_dir, replayed):
    ch = read_changelog(spark, sf_dir)
    diffs = audit_replay(replayed.raw_state(), ch, replayed.cfg)
    assert diffs.count() == 0


def test_partial_table_diverges_with_typed_verdicts(spark, sf_dir, replayed):
    """Audit the HALF-replay snapshot (time travel) against the full log:
    every diff must be a key the tail actually touched, and a key whose
    tail winner is a tombstone while the snapshot holds it live must read
    'missing'... (snapshot live + expected deleted = zombie)."""
    ch = read_changelog(spark, sf_dir)
    v_mid = max(1, replayed.table.current_version() // 2)
    frozen = replayed.table.read(v_mid)
    diffs = audit_replay(frozen, ch, replayed.cfg)
    rows = diffs.collect()
    assert rows, "tail segments touched nothing?"
    assert {r["verdict"] for r in rows} <= {"missing", "extra", "stale", "zombie"}
    # cross-check one verdict class end-to-end: every 'stale' key's expected
    # lsn must exceed its table lsn (the tail advanced it)
    for r in rows:
        if r["verdict"] == "stale":
            assert r["expected_lsn"] > r["table_lsn"]


def test_out_of_band_corruption_is_caught(spark, sf_dir, replayed):
    """Physically delete one live row (lake DML, no log event) — the audit
    must flag exactly that key as 'missing'."""
    from airbyte_spark.lake.dml import delete_where

    ch = read_changelog(spark, sf_dir)
    victim = replayed.final_state().select("url").first()[0]
    delete_where(replayed.table, F.col("url") == victim)
    diffs = audit_replay(replayed.raw_state(), ch, replayed.cfg).collect()
    assert [(r["url"], r["verdict"]) for r in diffs] == [(victim, "missing")]
