"""Crash/resume probe — the /verify recipe's step 3 as one command.

Replays checkpoints 0..K-1 of the deterministic sf changelog into a fresh
lake table, then REBUILDS the pipeline over the same path (simulating a
process crash: all driver state lost, only the table's committed-set
survives) and replays ALL checkpoints. Asserts:

  1. the first K checkpoints report `skipped` on the resumed run
     (exactly-once: committed keys are recognized from table metadata),
  2. redelivering an already-committed checkpoint does not bump the table
     version (idempotent no-op, no data churn),
  3. the final state equals the DuckDB LWW oracle byte-for-byte.

Usage: python scripts/probe_resume.py [sf_dir]   (default sf0.01)
Exit 0 + "PROBE_RESUME_OK" on success.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from airbyte_spark.session import get_spark  # noqa: E402
from airbyte_spark.sources.changelog import (  # noqa: E402
    changelog_oracle_cte,
    read_changelog,
)
from airbyte_spark.streaming.pipeline import CdcPipeline  # noqa: E402

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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k_before_crash = int(os.environ.get("PROBE_CRASH_AFTER", "5"))
    spark = get_spark("probe-resume", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    path = tempfile.mkdtemp(prefix="probe_resume_") + "/pages"

    changelog = read_changelog(spark, sf_dir)
    ckpts = sorted(
        r[0] for r in changelog.select("checkpoint_id").distinct().collect()
    )
    # crash mid-stream: at least one checkpoint applied, at least one left
    k_before_crash = max(1, min(k_before_crash, len(ckpts) - 1))
    head = [c for c in ckpts[:k_before_crash]]
    assert len(ckpts) >= 2, f"fixture has {len(ckpts)} checkpoints; need >= 2"

    # phase 1: apply the first K checkpoints, then "crash" (drop the pipe)
    pipe = CdcPipeline.create_target(spark, path, n_buckets=8)
    for c in head:
        r = pipe.apply_batch(
            changelog.filter(F.col("checkpoint_id") == c), f"ckpt-{c}"
        )
        assert not r.skipped, f"fresh checkpoint {c} must apply"
    del pipe

    # phase 2: rebuild over the same path (driver state lost) + full replay
    pipe2 = CdcPipeline.create_target(spark, path, n_buckets=8)
    statuses = []
    for c in ckpts:
        r = pipe2.apply_batch(
            changelog.filter(F.col("checkpoint_id") == c), f"ckpt-{c}"
        )
        statuses.append((c, r.skipped))
    skipped = [c for c, s in statuses if s]
    applied = [c for c, s in statuses if not s]
    assert skipped == head, f"resume must skip exactly {head}, skipped {skipped}"
    assert applied == ckpts[k_before_crash:], applied

    # phase 3: redelivery of a committed checkpoint is a version no-op
    v = pipe2.table.current_version()
    r = pipe2.apply_batch(
        changelog.filter(F.col("checkpoint_id") == ckpts[0]), f"ckpt-{ckpts[0]}"
    )
    assert r.skipped and pipe2.table.current_version() == v, "redelivery churned"

    # phase 4: final state == DuckDB oracle
    got = [
        (r["url"], r["warc_ts"], r["text"], r["lang"], r["_ab_cdc_lsn"])
        for r in pipe2.final_state()
        .select("url", "warc_ts", "text", "lang", "_ab_cdc_lsn")
        .orderBy("url")
        .collect()
    ]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = con.sql(FINAL_STATE_SQL).fetchall()
    assert got == want, f"final state diverged: {len(got)} vs {len(want)} rows"

    print(f"PROBE_RESUME_OK checkpoints={len(ckpts)} resumed_skip={len(skipped)} rows={len(got)}")
    spark.stop()


if __name__ == "__main__":
    main()
