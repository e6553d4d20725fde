"""End-to-end crawl loop: the full cycle a continuously-running web-scale
ingest executes, wired from the engine's own operators —

  history replay → recrawl schedule → per-domain budget → (synthetic)
  fetch → WARC shard write → WARC read → CDC envelope → idempotent LWW
  merge → incremental postings-index maintenance.

Asserts that refetched pages win LWW with byte-identically extracted text,
unfetched pages are untouched, the crawl commit is exactly-once, and the
retrieval index maintained from the change feed equals a full rebuild.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.operators.crawl import allocate_fetch_budget, recrawl_schedule
from airbyte_spark.operators.retrieval import apply_postings_delta, build_postings
from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.sources.warc import read_warc, write_warc
from airbyte_spark.streaming.pipeline import CdcPipeline


@pytest.fixture(scope="module")
def loop(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("crawl_loop")

    # 1. ingest the crawl history
    pipe = CdcPipeline.create_target(spark, str(base / "pages"), n_buckets=4)
    ch = read_changelog(spark, sf_dir, batch_span=100)
    pipe.replay(ch)
    v0 = pipe.table.current_version()
    before = {r["url"]: r["text"] for r in pipe.final_state().collect()}

    # 2. plan the next wave: change-rate schedule, then budget apportionment
    sched = recrawl_schedule(ch, top=50)
    picks = allocate_fetch_budget(sched, budget=5)
    pick_rows = picks.collect()
    urls = [r["url"] for r in pick_rows]
    assert 1 <= len(urls) <= 5
    assert set(urls) <= set(before)  # frontier only proposes known live pages

    # 3. "fetch" the picked urls: new revisions with fresh bodies, sharded
    #    out as a WARC crawl segment (what a fetcher fleet would produce)
    horizon = int(ch.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    fetched = picks.select(
        "url",
        (
            F.to_timestamp(F.lit("2025-01-01 00:00:00")).cast("timestamp_ntz")
            + F.make_dt_interval(F.lit(0), F.lit(0), F.col("slot").cast("int"), F.lit(0))
        ).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><p>refetch "), F.col("url"), F.lit("</p></body></html>")),
            "utf-8",
        ).alias("html"),
    )
    warc_dir = str(base / "wave1")
    write_warc(fetched, warc_dir, n_shards=2)

    # 4. ingest the segment: container read → CDC envelope → one idempotent merge
    pages = read_warc(spark, warc_dir + "/*.warc.gz")
    from pyspark.sql import Window

    batch = pages.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.col("warc_ts").alias("_ab_cdc_updated_at"),
        F.lit(None).cast("timestamp_ntz").alias("_ab_cdc_deleted_at"),
        (F.lit(horizon) + F.row_number().over(Window.orderBy("url")))
        .cast("bigint")
        .alias("_ab_cdc_lsn"),
        F.col("warc_ts").alias("_emitted_at"),
        F.lit(horizon // 100 + 1).cast("bigint").alias("checkpoint_id"),
    )
    res = pipe.apply_batch(batch, checkpoint_key="crawl-wave-1")
    assert not res.skipped and res.rows_in == len(urls)
    return pipe, v0, before, urls, batch


def test_refetched_pages_win_lww_with_extracted_text(loop):
    pipe, _v0, before, urls, _batch = loop
    after = {r["url"]: r["text"] for r in pipe.final_state().collect()}
    assert set(after) == set(before)  # no pages appeared or vanished
    for u in urls:
        assert after[u] == f"refetch {u}"  # byte-identical extraction rule
    for u in set(before) - set(urls):
        assert after[u] == before[u]  # untouched pages carried over


def test_crawl_commit_is_exactly_once(loop, spark):
    pipe, _v0, _before, _urls, batch = loop
    v = pipe.table.current_version()
    res = pipe.apply_batch(batch, checkpoint_key="crawl-wave-1")
    assert res.skipped and pipe.table.current_version() == v


def test_postings_index_maintained_through_crawl_wave(loop):
    pipe, v0, _before, urls, _batch = loop
    from airbyte_spark.lake.changes import row_changes

    def visible(df):
        return df.filter(F.col("_ab_cdc_deleted_at").isNull())

    postings = build_postings(visible(pipe.table.read(v0)))
    feed = visible(row_changes(pipe.table, v0))
    maintained = {
        (r["term"], r["url"]): r["tf"]
        for r in apply_postings_delta(postings, feed).collect()
    }
    rebuilt = {
        (r["term"], r["url"]): r["tf"]
        for r in build_postings(visible(pipe.table.read())).collect()
    }
    assert maintained == rebuilt
    # the refetched docs' new vocabulary is indexed ("refetch" appears)
    assert all(("refetch", u) in maintained for u in urls)
