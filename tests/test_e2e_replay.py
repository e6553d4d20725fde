"""End-to-end: replay the deterministic changelog → final table == SQL oracle.

This is the engine's load-bearing correctness test, the analog of the
reference's testIncrementalDedupeSync (DestinationAcceptanceTest.java:559-641):
final state must be exactly "latest non-deleted version per url" with text
extracted byte-identically.
"""

from __future__ import annotations

import duckdb
import pytest

from airbyte_spark.sources.changelog import changelog_oracle_cte, read_changelog
from airbyte_spark.streaming.pipeline import CdcPipeline

FINAL_STATE_SQL = f"""
WITH ch AS ({changelog_oracle_cte()}),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY url ORDER BY warc_ts DESC, _ab_cdc_lsn DESC) AS rn
  FROM ch
)
SELECT url, warc_ts, text, lang, _ab_cdc_lsn
FROM r WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
ORDER BY url
"""


def oracle_final_state(sf_dir: str):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con.sql(FINAL_STATE_SQL).fetchall()


@pytest.fixture(scope="module")
def replayed(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "pages")
    pipe = CdcPipeline.create_target(spark, path, n_buckets=8)
    changelog = read_changelog(spark, sf_dir)
    results = pipe.replay(changelog)
    return pipe, results


def test_final_state_matches_oracle(replayed, spark, sf_dir):
    pipe, _ = replayed
    got = [
        (r["url"], r["warc_ts"], r["text"], r["lang"], r["_ab_cdc_lsn"])
        for r in pipe.final_state()
        .select("url", "warc_ts", "text", "lang", "_ab_cdc_lsn")
        .orderBy("url")
        .collect()
    ]
    want = oracle_final_state(sf_dir)
    assert len(got) == len(want)
    assert got == want


def test_replay_is_idempotent(replayed, sf_dir, spark):
    """Re-running the whole replay must be a pure no-op (exactly-once)."""
    pipe, _ = replayed
    v_before = pipe.table.current_version()
    results = pipe.replay(read_changelog(spark, sf_dir))
    assert all(r.skipped for r in results)
    assert pipe.table.current_version() == v_before


def test_metrics_recorded_per_checkpoint(replayed):
    pipe, results = replayed
    committed = pipe.committed_checkpoints()
    assert committed == sorted(f"ckpt-{i}" for i in range(len(committed)))
    m = pipe.metrics()
    assert m.count() == len(committed)
    row = m.orderBy("checkpoint_key").first()
    assert row["rows_written"] > 0 and row["bytes_written"] > 0


def test_tombstoned_urls_absent(replayed, spark, sf_dir):
    """Any url whose globally-latest event is a delete must be absent."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    pipe, _ = replayed
    from airbyte_spark.sources.changelog import read_changelog as rc

    ch = rc(spark, sf_dir)
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.col("_ab_cdc_lsn").desc()
    )
    latest = ch.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    deleted_urls = {
        r[0] for r in latest.filter(F.col("_ab_cdc_deleted_at").isNotNull()).select("url").collect()
    }
    assert deleted_urls, "fixture should contain tombstone-final urls"
    final_urls = {r[0] for r in pipe.final_state().select("url").collect()}
    assert not (deleted_urls & final_urls)
