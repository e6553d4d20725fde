"""External Debezium-tail source seam: a directory of envelope JSONL
drained through parse_debezium → CdcPipeline with a pre-captured stop
position (≡ AirbyteDebeziumHandler target-position semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.sources.debezium_tail import (
    capture_target_position,
    read_debezium_tail,
    run_debezium_tail,
    write_debezium_tail,
)
from airbyte_spark.streaming.pipeline import CdcPipeline


@pytest.fixture()
def tail(spark, sf_dir, tmp_path):
    ch = read_changelog(spark, sf_dir)
    d = str(tmp_path / "tail")
    write_debezium_tail(ch, d)
    return ch, d


def _final(pipe):
    return {
        r["url"]: (r["warc_ts"], r["text"], r["_ab_cdc_lsn"])
        for r in pipe.final_state().collect()
    }


def test_tail_replay_equals_changelog_replay(spark, sf_dir, tmp_path, tail):
    ch, d = tail
    target = capture_target_position(spark, d)
    assert target == ch.agg(F.max("_ab_cdc_lsn")).first()[0]

    ref = CdcPipeline.create_target(spark, str(tmp_path / "ref") + "/pages", n_buckets=4)
    ref.replay(ch)

    pipe = CdcPipeline.create_target(spark, str(tmp_path / "t") + "/pages", n_buckets=4)
    run_debezium_tail(
        pipe, d, str(tmp_path / "ck"), target_lsn=target
    )
    assert _final(pipe) == _final(ref)


def test_bounded_drain_excludes_post_target_events(spark, sf_dir, tmp_path, tail):
    """Envelopes that land in the tail AFTER the position capture (higher
    lsn) must not apply this sync — and must apply on the NEXT sync."""
    ch, d = tail
    target = capture_target_position(spark, d)
    # "concurrent writer": higher-lsn updates that would win LWW for their keys
    post = (
        ch.filter(F.col("_ab_cdc_lsn") % 7 == 0)
        .withColumn("_ab_cdc_lsn", F.col("_ab_cdc_lsn") + 100_000_000)
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 400 DAYS"))
        .withColumn("checkpoint_id", F.col("checkpoint_id") + 100_000)
    )
    write_debezium_tail(post, d)

    pipe = CdcPipeline.create_target(spark, str(tmp_path / "t") + "/pages", n_buckets=4)
    run_debezium_tail(pipe, d, str(tmp_path / "ck"), target_lsn=target)
    got = _final(pipe)
    assert got and max(l for _, _, l in got.values()) <= target

    # next sync: fresh position sees the backlog, drains exactly it
    target2 = capture_target_position(spark, d)
    assert target2 > target
    run_debezium_tail(pipe, d, str(tmp_path / "ck2"), target_lsn=target2)
    got2 = _final(pipe)
    assert max(l for _, _, l in got2.values()) > 100_000_000
    ref = CdcPipeline.create_target(spark, str(tmp_path / "r") + "/pages", n_buckets=4)
    ref.replay(ch.unionByName(post))
    assert got2 == _final(ref)


def test_tail_redelivery_is_noop_and_dead_letters_split(spark, sf_dir, tmp_path, tail):
    ch, d = tail
    # malformed lines in the tail must route to dead letters, not crash
    spark.createDataFrame(
        [("{not json",), ('{"op":null}',)], "value string"
    ).write.mode("append").text(d)
    target = capture_target_position(spark, d)

    good, dead = read_debezium_tail(spark, d, target_lsn=target)
    assert dead.count() == 2 and good.count() == ch.count()

    pipe = CdcPipeline.create_target(spark, str(tmp_path / "t") + "/pages", n_buckets=4)
    run_debezium_tail(pipe, d, str(tmp_path / "ck"), target_lsn=target)
    v = pipe.table.current_version()
    want = _final(pipe)
    # full redelivery (fresh streaming checkpoint, same table): every
    # segment already committed → no new version, same state
    run_debezium_tail(pipe, d, str(tmp_path / "ck2"), target_lsn=target)
    assert pipe.table.current_version() == v
    assert _final(pipe) == want


def test_tail_parses_each_batch_exactly_once(
    spark, sf_dir, tmp_path, tail, monkeypatch
):
    """The drain's hot loop must evaluate the envelope parse ONCE per
    micro-batch: the dead-letter probe, the segment listing, and the
    merge all read the pinned parse. Counted by routing every input line
    through an accumulator-bumping pandas UDF injected ahead of the
    parse — if any downstream action re-evaluated the text scan, the
    count would land at 2-3× the line count."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    import airbyte_spark.sources.debezium_tail as dt

    ch, d = tail
    # dead letters present → the probe AND the dead write both run
    spark.createDataFrame(
        [("{not json",), ('{"op":null}',)], "value string"
    ).write.mode("append").text(d)
    n_lines = spark.read.text(d).count()
    target = capture_target_position(spark, d)

    acc = spark.sparkContext.accumulator(0)

    def bump_fn(s):
        acc.add(len(s))
        return s

    # module-level `from __future__ import annotations` stringifies
    # hints, which pandas_udf can't resolve — attach real objects
    bump_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    bump = pandas_udf(bump_fn, StringType())

    orig = dt.parse_debezium

    def counting_parse(df, payload_schema, **kw):
        return orig(df.withColumn("value", bump(F.col("value"))), payload_schema, **kw)

    monkeypatch.setattr(dt, "parse_debezium", counting_parse)
    pipe = CdcPipeline.create_target(spark, str(tmp_path / "t") + "/pages", n_buckets=4)
    run_debezium_tail(
        pipe, d, str(tmp_path / "ck"), target_lsn=target,
        max_files_per_trigger=10_000,  # one micro-batch
    )
    assert acc.value == n_lines, (acc.value, n_lines)
    assert _final(pipe), "drain still lands records"


def test_wire_roundtrip_hostile_content(spark, tmp_path):
    """The envelope wire must survive hostile page content byte-exactly:
    newlines/quotes/backslashes in html (JSONL escaping), unicode urls,
    NULL lang, micro-precision cursors, and delete before-images."""
    import datetime as dt

    rows = [
        ("https://ex.com/ünïcode/ページ", dt.datetime(2024, 1, 1, 0, 0, 0, 123457),
         '<p>line1\nline2\t"quoted" \\back\\slash</p>', "en", None, 1),
        ("https://ex.com/a", dt.datetime(2024, 1, 2, 3, 4, 5, 999999),
         "<html>{}[]&amp;</html>", None, None, 2),
        ("https://ex.com/del", dt.datetime(2024, 1, 3, 0, 0, 1, 1),
         "<p>tombstone body</p>", "de",
         dt.datetime(2024, 1, 3, 0, 0, 1), 3),
    ]
    ch = spark.createDataFrame(
        [
            (u, ts, h.encode(), None, lang, ts, d, lsn, ts, lsn // 1000)
            for (u, ts, h, lang, d, lsn) in rows
        ],
        "url string, warc_ts timestamp_ntz, html binary, text string, "
        "lang string, _ab_cdc_updated_at timestamp_ntz, "
        "_ab_cdc_deleted_at timestamp_ntz, _ab_cdc_lsn long, "
        "_emitted_at timestamp_ntz, checkpoint_id long",
    )
    d = str(tmp_path / "tail")
    write_debezium_tail(ch, d)
    from airbyte_spark.sources.debezium_tail import page_record_mapper

    good, dead = read_debezium_tail(spark, d)
    assert dead.count() == 0
    back = {r["url"]: r for r in page_record_mapper(good).collect()}
    for (u, ts, h, lang, deleted, lsn) in rows:
        r = back[u]
        assert bytes(r["html"]) == h.encode(), u
        assert r["warc_ts"] == ts, u  # micro-exact through warc_ts_us
        assert r["lang"] == lang and r["_ab_cdc_lsn"] == lsn
        assert (r["_ab_cdc_deleted_at"] is not None) == (deleted is not None)


def test_capture_position_on_missing_or_empty_tail(spark, tmp_path):
    """An absent or empty tail dir yields position None (the handler's
    empty-log case), not an AnalysisException."""
    assert capture_target_position(spark, str(tmp_path / "nope")) is None
    (tmp_path / "empty").mkdir()
    assert capture_target_position(spark, str(tmp_path / "empty")) is None
