"""Source acceptance harness: one parametrized contract suite every
registered source plug-in must pass (≡ the reference's
source-acceptance-test package — TestDiscovery/TestBasicRead schema +
record checks, TestFullRefresh.test_sequential_reads,
TestIncremental.test_two_sequential_reads and
test_state_with_abnormally_large_values — re-expressed for the
(spark, state) -> DataFrame source protocol). Adding a source to the
registry without an entry here is a test failure: the harness
cross-checks its case list against the registry."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from airbyte_spark.sources.registry import _REGISTRY, source_factory


def _fixture_events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _mk_synthetic(spark, sf_dir, tmp):
    src = source_factory("synthetic_changelog")(sf_dir, batch_span=500)
    return src, "checkpoint_id"


def _mk_mapped(spark, sf_dir, tmp):
    src = source_factory("mapped_parquet")(
        f"{sf_dir}/events.parquet",
        column_map={
            "url": "concat('https://site-', cast(user_id % 10 as string), "
            "'.example.com/p/', cast(user_id as string))",
            "warc_ts": "ts",
            "_ab_cdc_deleted_at": "if(event_type = 'error', ts, null)",
            "_ab_cdc_lsn": "event_id",
        },
        batch_span=500,
    )
    return src, "checkpoint_id"


def _mk_airbyte_jsonl(spark, sf_dir, tmp):
    from airbyte_spark.sources.airbyte_messages import write_airbyte_messages

    out = str(tmp / "msgs")
    write_airbyte_messages(
        _fixture_events(spark, sf_dir).select("event_id", "event_type", "value", "ts"),
        out,
        "events",
        state={"cursor_value": "ck"},
        emitted_at_col="ts",
    )
    src = source_factory("airbyte_jsonl")(
        out, "event_id bigint, event_type string, value double", stream="events"
    )
    return src, None  # cursor_value-state source: no checkpoint_id contract


def _mk_http(spark, sf_dir, tmp):
    schema = _fixture_events(spark, sf_dir).schema
    src = source_factory("http_events")(sf_dir, schema, page_size=2_000)
    return src, None


def _mk_warc(spark, sf_dir, tmp):
    from airbyte_spark.sources.warc import write_warc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("https://example.com/d/"), F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.col("doc_id") * 60).cast("timestamp_ntz").alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
    )
    out = str(tmp / "warc")
    write_warc(pages, out, n_shards=4)
    src = source_factory("warc")(out + "/*.warc.gz", n_checkpoints=8)
    return src, "checkpoint_id"


def _mk_debezium(spark, sf_dir, tmp):
    from airbyte_spark.sources.changelog import read_changelog
    from airbyte_spark.sources.debezium_tail import write_debezium_tail

    out = str(tmp / "tail")
    write_debezium_tail(read_changelog(spark, sf_dir, batch_span=500), out)
    src = source_factory("debezium_jsonl")(out, batch_span=500)
    return src, "checkpoint_id"


def _mk_jsonl(spark, sf_dir, tmp):
    out = str(tmp / "jl")
    (
        _fixture_events(spark, sf_dir)
        .select("event_id", "user_id", "event_type", "value", "ts")
        .coalesce(2)
        .write.json(out)
    )
    src = source_factory("jsonl")(
        out,
        column_map={
            "url": "concat('https://e/', cast(event_id as string))",
            "warc_ts": "to_timestamp(ts)",
            "_ab_cdc_lsn": "event_id",
        },
        batch_span=500,
    )
    return src, "checkpoint_id"


def _mk_sql(spark, sf_dir, tmp):
    import duckdb

    db = str(tmp / "src.duckdb")
    con = duckdb.connect(db)
    con.execute(
        f"CREATE TABLE events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    con.close()
    src = source_factory("sql")(
        db, "events",
        column_map={
            "url": "concat('https://e/', cast(event_id as string))",
            "warc_ts": "ts",
            "_ab_cdc_lsn": "event_id",
        },
        cursor_field="ts", lsn_field="event_id",
        partition_column="event_id", num_partitions=4, batch_span=500,
    )
    return src, "checkpoint_id"


CASES = {
    "sql": _mk_sql,
    "synthetic_changelog": _mk_synthetic,
    "jsonl": _mk_jsonl,
    "mapped_parquet": _mk_mapped,
    "airbyte_jsonl": _mk_airbyte_jsonl,
    "http_events": _mk_http,
    "warc": _mk_warc,
    "debezium_jsonl": _mk_debezium,
}


def test_every_registered_source_has_an_acceptance_case():
    # import modules whose @register_source decorators populate the registry
    import airbyte_spark.sources.airbyte_messages  # noqa: F401
    import airbyte_spark.sources.debezium_tail  # noqa: F401
    import airbyte_spark.sources.http  # noqa: F401
    import airbyte_spark.sources.sql  # noqa: F401
    import airbyte_spark.sources.warc  # noqa: F401

    missing = sorted(set(_REGISTRY) - set(CASES))
    assert not missing, f"registered sources without acceptance coverage: {missing}"


@pytest.fixture(params=sorted(CASES), ids=sorted(CASES))
def case(request, spark, sf_dir, tmp_path):
    src, ck_col = CASES[request.param](spark, sf_dir, tmp_path)
    return request.param, src, ck_col


def test_basic_read_schema_stable_and_records_present(spark, case):
    """≡ TestBasicRead: a configured read produces records with a stable,
    re-derivable schema; key payload columns are non-null."""
    name, src, _ = case
    df1, df2 = src(spark, {}), src(spark, {})
    assert df1.schema == df2.schema
    n = df1.count()
    assert n > 0, f"{name}: empty read"
    key = "url" if "url" in df1.columns else df1.columns[0]
    assert df1.filter(F.col(key).isNull()).count() == 0


def test_full_refresh_sequential_reads_identical(spark, case):
    """≡ TestFullRefresh.test_sequential_reads: two reads of the same
    configured source yield identical record multisets."""
    _, src, _ = case
    a, b = src(spark, {}), src(spark, {})
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_incremental_resume_partitions_the_stream(spark, case):
    """≡ TestIncremental.test_two_sequential_reads: records before the
    checkpoint are excluded by a resumed read, and (full) = (first part) ∪
    (resumed part) exactly."""
    name, src, ck = case
    if ck is None:
        pytest.skip(f"{name}: cursor-state source, not checkpoint-resumable")
    full = src(spark, {})
    lo, hi = full.agg(F.min(ck), F.max(ck)).first()
    mid = (lo + hi) // 2 + 1
    resumed = src(spark, {"from_checkpoint": int(mid)})
    want = full.filter(F.col(ck) >= mid)
    assert resumed.exceptAll(want).count() == 0
    assert want.exceptAll(resumed).count() == 0
    assert resumed.count() < full.count()


def test_abnormally_large_state_yields_no_records(spark, case):
    """≡ TestIncremental.test_state_with_abnormally_large_values: a state
    from the far future must produce zero records, not an error."""
    name, src, ck = case
    if ck is None:
        pytest.skip(f"{name}: cursor-state source")
    assert src(spark, {"from_checkpoint": 10**15}).count() == 0
