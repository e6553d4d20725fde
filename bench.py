"""Benchmark harness — prints ONE JSON line with headline timings.

Headline: full CDC replay (dedup → vectorized extract → LWW merge into the
lake table) of the sf change stream, reported as seconds plus derived
events/sec (the BASELINE.json metric). Secondary queries cover the other
operator families so regressions show up per-operator.

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_BATCHES       number of replay micro-batches (default 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from airbyte_spark.session import get_spark  # noqa: E402


def time_one(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_batches = int(os.environ.get("BENCH_BATCHES", "10"))
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from airbyte_spark.sources.changelog import derive_changelog
    from airbyte_spark.streaming.pipeline import CdcPipeline

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = events.count()
    batch_span = max(1, (n_events + n_batches - 1) // n_batches)
    # repartition before caching: the single-file parquet source would
    # otherwise pin every per-batch scan to 1-2 cache partitions
    changelog = derive_changelog(events, batch_span=batch_span).repartition(int(cpus) * 2).cache()
    changelog.count()  # materialize once; replay then reads from cache

    queries: dict[str, float] = {}

    # -- headline: full CDC replay into a fresh lake table --------------------
    work = tempfile.mkdtemp(prefix="bench_lake_")
    try:
        # Warmup: one throwaway micro-batch to pay JVM codegen + Python/Arrow
        # worker startup once, so the timed run measures steady-state
        # throughput (what a long-running stream actually sees).
        warm = CdcPipeline.create_target(spark, f"{work}/warmup", n_buckets=int(cpus))
        warm.apply_batch(changelog.filter(F.col("checkpoint_id") == 0), "warm-0")

        pipe = CdcPipeline.create_target(spark, f"{work}/pages", n_buckets=int(cpus))
        queries["cdc_replay"] = time_one(lambda: pipe.replay(changelog))
        final_rows = pipe.final_state().count()

        # merge-on-read comparison on the same cached changelog: append-only
        # write path (no existing-file rewrites), LWW resolved at read time
        from airbyte_spark.lake.merge import compact_versions

        mor = CdcPipeline.create_target(
            spark, f"{work}/pages_mor", n_buckets=int(cpus), write_mode="mor"
        )
        queries["cdc_replay_mor"] = time_one(lambda: mor.replay(changelog))
        queries["mor_resolve_read"] = time_one(lambda: mor.final_state().count())
        queries["mor_compact_versions"] = time_one(
            lambda: compact_versions(mor.table, mor.cfg)
        )

        # -- secondary operator timings --------------------------------------
        import __spark_entry__ as entry

        # the headline table IS this session's replayed table — register it
        # so replay-consuming queries (matview time travel, final-state
        # reads) reuse it instead of replaying a second lake. The headline
        # keeps the whole replay cost on the cdc_replay line. The `work`
        # dir must outlive this loop (hence the widened try scope).
        entry._replay_cache[f"{id(spark)}:{sf_dir}"] = pipe

        qs = entry.queries()
        for name, fn in qs.items():
            if name in (
                "cdc_replay_final_state",
                "cdc_mor_replay_final_state",
                "cdc_mor_resolve_read",
            ):
                continue  # covered by the headline replay + mor_resolve_read lines
            queries[name] = time_one(lambda fn=fn: fn(spark, sf_dir).count())
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "cdc_replay_plus_operator_suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "events": n_events,
        "final_rows": final_rows,
        "events_per_sec": round(n_events / queries["cdc_replay"], 1),
        "events_per_sec_mor": round(n_events / queries["cdc_replay_mor"], 1),
        "cpus": int(cpus),
        "batches": n_batches,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
