"""Multi-stream catalog sync + source plug-in protocol.

≡ reference: ConfiguredAirbyteCatalog with per-stream modes
(airbyte_protocol.yaml:160-198), per-stream state (StateManager.java:
154-195), and the Stream-subclass source contract (streams/core.py:43-150)
— here two streams with different PKs/modes sync end-to-end through one
catalog, and a generic mapped-parquet source reproduces the synthetic
changelog bit-for-bit (the "new connector without new code" seam)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.catalog import ConfiguredStream, SyncCatalog, sync
from airbyte_spark.protocol import DestinationSyncMode, StreamConfig, SyncMode
from airbyte_spark.schema import CHANGE_SCHEMA
from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.sources.registry import (
    mapped_parquet_source,
    source_factory,
    synthetic_changelog_source,
)
from airbyte_spark.streaming.pipeline import CdcPipeline, default_target_schema


def test_registry_lookup():
    assert source_factory("synthetic_changelog") is synthetic_changelog_source
    assert source_factory("mapped_parquet") is mapped_parquet_source
    with pytest.raises(KeyError):
        source_factory("nope")


def test_mapped_parquet_source_equals_builtin_changelog(spark, sf_dir):
    """The generic configurable source, pointed at events.parquet with the
    url/cursor/lsn mapping, must reproduce the built-in stream exactly."""
    src = mapped_parquet_source(
        f"{sf_dir}/events.parquet",
        column_map={
            "url": "concat('https://site-', cast(user_id % 10 as string), "
            "'.example.com/p/', cast(user_id as string))",
            "warc_ts": "ts",
            "_ab_cdc_deleted_at": "if(event_type = 'error', ts, null)",
            "_ab_cdc_lsn": "event_id",
        },
        batch_span=100,
    )
    got = src(spark, {})
    want = read_changelog(spark, sf_dir, batch_span=100).select(got.columns)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # state: resume point filters whole checkpoints
    resumed = src(spark, {"from_checkpoint": 3})
    lo = resumed.agg(F.min("checkpoint_id")).collect()[0][0]
    assert lo is not None and lo >= 3


def test_two_stream_catalog_sync(spark, sf_dir, tmp_path):
    """Two streams, different PKs and destination modes, one catalog sync:
    per-stream targets, per-stream state, both correct."""
    pages = ConfiguredStream(
        cfg=StreamConfig(name="pages", schema=default_target_schema()),
        source=synthetic_changelog_source(sf_dir, batch_span=500),
        target_path=str(tmp_path / "pages"),
        n_buckets=4,
    )
    # second stream: same events, keyed by (url, lang) composite, overwrite
    events_cfg = StreamConfig(
        name="pages_by_lang",
        schema=default_target_schema(),
        sync_mode=SyncMode.FULL_REFRESH,
        destination_sync_mode=DestinationSyncMode.OVERWRITE,
        primary_key=["url", "lang"],
    )
    by_lang = ConfiguredStream(
        cfg=events_cfg,
        source=synthetic_changelog_source(sf_dir, batch_span=500),
        target_path=str(tmp_path / "by_lang"),
        n_buckets=4,
        extract=False,
    )
    cat = SyncCatalog([pages, by_lang])

    disc = cat.discover()
    assert [s["name"] for s in disc["streams"]] == ["pages", "pages_by_lang"]
    assert disc["streams"][1]["source_defined_primary_key"] == [["url"], ["lang"]]

    res = sync(spark, cat)
    assert res[0]["mode"] == "append_dedup" and res[0]["applied"] > 0
    assert res[1]["mode"] == "overwrite" and res[1]["rows"] > 0

    # stream 1: final state equals the single-stream pipeline's
    solo = CdcPipeline.create_target(spark, str(tmp_path / "solo"), n_buckets=4)
    solo.replay(read_changelog(spark, sf_dir, batch_span=500))
    cols = ["url", "warc_ts", "_ab_cdc_lsn"]
    a = sorted(map(tuple, CdcPipeline.create_target(spark, pages.target_path).final_state().select(cols).collect()))
    b = sorted(map(tuple, solo.final_state().select(cols).collect()))
    assert a == b and len(a) > 0

    # re-sync: stream 1 skips all committed segments (per-stream state)
    res2 = sync(spark, cat)
    assert res2[0]["applied"] == 0 and res2[0]["skipped"] > 0


def test_namespace_mapping_and_post_sync_sql(spark, sf_dir, tmp_path):
    """Stream-prefix/namespace rewrite (≡ NamespacingMapper) + the custom
    post-sync SQL hook (≡ operator dbt transformations)."""
    from airbyte_spark.catalog import apply_namespace_mapping, post_sync_sql, sync_stream

    s = ConfiguredStream(
        cfg=StreamConfig(name="pages", schema=default_target_schema()),
        source=synthetic_changelog_source(sf_dir, batch_span=500),
        target_path=str(tmp_path / "pages"),
        n_buckets=4,
        extract=False,
    )
    mapped = apply_namespace_mapping(
        SyncCatalog([s]), prefix="crawl_", namespace_format="${SOURCE_NAMESPACE}",
        source_namespace="prod",
    )
    m = mapped.streams[0]
    assert m.cfg.name == "crawl_pages"
    assert m.target_path.endswith("/prod/crawl_pages")
    assert s.cfg.name == "pages"  # original untouched

    sync_stream(spark, m)
    out = post_sync_sql(
        spark, m, "SELECT lang, count(*) AS n FROM crawl_pages GROUP BY lang"
    ).collect()
    assert sum(r["n"] for r in out) > 0 and len(out) >= 2


def test_cli_sync_catalog_json(spark, sf_dir, tmp_path):
    """CLI `sync --catalog file.json`: the JSON-configured multi-stream
    surface end-to-end (catalog_from_json → registry source → sync)."""
    import argparse
    import json

    from airbyte_spark.cli import run

    doc = {
        "streams": [
            {
                "name": "pages",
                "schema_ddl": (
                    "url string, warc_ts timestamp_ntz, html binary, text string, "
                    "lang string, _ab_cdc_lsn bigint, _ab_cdc_deleted_at timestamp_ntz"
                ),
                "source": {
                    "type": "synthetic_changelog",
                    "args": {"sf_dir": sf_dir, "batch_span": 500},
                },
                "target": str(tmp_path / "pages"),
                "primary_key": ["url"],
                "n_buckets": 4,
            }
        ]
    }
    cat_file = tmp_path / "catalog.json"
    cat_file.write_text(json.dumps(doc))

    disc = run(spark, argparse.Namespace(cmd="discover-catalog", catalog=str(cat_file)))
    assert disc["streams"][0]["name"] == "pages"

    out = run(spark, argparse.Namespace(cmd="sync", catalog=str(cat_file)))
    assert out["streams"][0]["applied"] > 0
    out2 = run(spark, argparse.Namespace(cmd="sync", catalog=str(cat_file)))
    assert out2["streams"][0]["applied"] == 0 and out2["streams"][0]["skipped"] > 0


def test_jsonl_source_infers_and_maps(spark, sf_dir, tmp_path):
    """JSON-lines connector: schema is inferred from records (≡ the
    reference's discover-time JSON-schema inference); with a column_map
    casting the string timestamp, it reproduces the built-in changelog's
    key/cursor/lsn columns exactly. Without a map, inferred fields pass
    through and the envelope defaults complete the stream."""
    from airbyte_spark.sources.registry import jsonl_source, source_factory

    assert source_factory("jsonl") is jsonl_source

    # materialize the events table as jsonl with foreign column names
    d = str(tmp_path / "events_jsonl")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id AS uid",
            "date_format(ts, \"yyyy-MM-dd'T'HH:mm:ss.SSSSSS\") AS occurred_at",
            "event_id AS seq",
            "event_type AS kind",
        )
        .write.mode("overwrite").json(d)
    )

    src = jsonl_source(
        d,
        column_map={
            "url": "concat('https://site-', cast(uid % 10 as string), "
            "'.example.com/p/', cast(uid as string))",
            "warc_ts": "to_timestamp_ntz(occurred_at)",
            "_ab_cdc_deleted_at": "if(kind = 'error', to_timestamp_ntz(occurred_at), null)",
            "_ab_cdc_lsn": "seq",
        },
        batch_span=100,
    )
    got = src(spark, {})
    cols = ["url", "warc_ts", "_ab_cdc_deleted_at", "_ab_cdc_lsn", "checkpoint_id"]
    want = read_changelog(spark, sf_dir, batch_span=100).select(cols)
    got = got.select(cols)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # no column_map: inference passes fields through; lsn mapping required
    bare = jsonl_source(d)
    with pytest.raises(ValueError, match="_ab_cdc_lsn"):
        bare(spark, {})


def _two_stream_catalog(sf_dir, tmp_path):
    pages = ConfiguredStream(
        cfg=StreamConfig(name="pages", schema=default_target_schema()),
        source=synthetic_changelog_source(sf_dir, batch_span=500),
        target_path=str(tmp_path / "pages"),
        n_buckets=4,
    )
    by_lang = ConfiguredStream(
        cfg=StreamConfig(
            name="pages_by_lang",
            schema=default_target_schema(),
            sync_mode=SyncMode.FULL_REFRESH,
            destination_sync_mode=DestinationSyncMode.OVERWRITE,
            primary_key=["url", "lang"],
        ),
        source=synthetic_changelog_source(sf_dir, batch_span=500),
        target_path=str(tmp_path / "by_lang"),
        n_buckets=4,
        extract=False,
    )
    return SyncCatalog([pages, by_lang])


def test_atomic_catalog_sync_publishes_all_streams_at_once(spark, sf_dir, tmp_path):
    """atomic=True stages every stream's whole sync on txn branches and
    publishes them in one catalog decision: despite the CDC stream's many
    checkpointed commits, each MAIN table advances exactly one version."""
    from airbyte_spark.lake.format import LakeTable

    cat = _two_stream_catalog(sf_dir, tmp_path)
    res = sync(spark, cat, atomic=True, txn_log_dir=str(tmp_path / "_txn"))
    assert all("published_version" in r for r in res)
    for s in cat.streams:
        t = LakeTable.load(spark, s.target_path)
        # create (v1) + one atomic publish (v2) — N branch commits collapse
        assert t.current_version() == 2
        assert t.branches() == []  # txn branch cleaned up
    # results match the non-atomic path exactly
    pipe = CdcPipeline.create_target(spark, cat.streams[0].target_path)
    solo = CdcPipeline.create_target(spark, str(tmp_path / "solo"), n_buckets=4)
    solo.replay(read_changelog(spark, sf_dir, batch_span=500))
    cols = ["url", "warc_ts", "_ab_cdc_lsn"]
    a = sorted(map(tuple, pipe.final_state().select(cols).collect()))
    b = sorted(map(tuple, solo.final_state().select(cols).collect()))
    assert a == b and len(a) > 0
    # per-stream committed state published WITH the data → resync skips
    res2 = sync(spark, cat, atomic=True, txn_log_dir=str(tmp_path / "_txn"))
    assert res2[0]["applied"] == 0 and res2[0]["skipped"] > 0


def test_atomic_catalog_sync_failure_publishes_nothing(spark, sf_dir, tmp_path):
    """A stream failing mid-sync aborts the whole catalog: every main
    table is untouched — no half-written multi-stream state, the exact
    gap the reference's per-stream flushes leave open."""
    from airbyte_spark.lake.format import LakeTable

    cat = _two_stream_catalog(sf_dir, tmp_path)

    def exploding_source(spark_, state):
        raise RuntimeError("source went away mid-sync")

    cat.streams[1].source = exploding_source
    with pytest.raises(RuntimeError, match="went away"):
        sync(spark, cat, atomic=True, txn_log_dir=str(tmp_path / "_txn"))
    for s in cat.streams:
        t = LakeTable.load(spark, s.target_path)
        assert t.current_version() == 1  # only the empty create commit
        assert t.read().count() == 0
        assert t.branches() == []  # aborted branches dropped


def test_catalog_rejects_malformed_stream_entry():
    import pytest

    from airbyte_spark.catalog import catalog_from_json

    doc = {"streams": [{
        "name": "pages",
        # schema_ddl missing; bad enum; bad type
        "source": {"type": "mapped_parquet"},
        "target": "/t",
        "sync_mode": "upsert",
        "n_buckets": "sixteen",
    }]}
    with pytest.raises(ValueError) as e:
        catalog_from_json(doc)
    msg = str(e.value)
    assert "missing required: schema_ddl" in msg
    assert "enum: sync_mode" in msg and "type: n_buckets" in msg
