"""HTTP API stream source: offset/token pagination, retries, substreams.

Covers the §2.1 HTTP-stream + parent-child rows: distributed offset-page
fetch equals a plain scan of the same data, token chaining visits every
page exactly once, backoff retries transient transport failures with the
exponential schedule, and the substream fans child reads out per parent
with the parent FK stamped on.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from airbyte_spark.sources.http import (
    HttpStreamConfig,
    TransportError,
    events_rest_transport,
    read_http_stream,
    read_http_substream,
    with_retries,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


@pytest.fixture(scope="module")
def expected(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _cfg(pagination, page_size=500, **kw):
    return HttpStreamConfig(
        name="events",
        path="events" if pagination == "offset" else "events_chain",
        schema=EVENTS_SCHEMA,
        page_size=page_size,
        pagination=pagination,
        **kw,
    )


def test_offset_pagination_equals_table(spark, sf_dir, expected):
    got = read_http_stream(
        spark, _cfg("offset"), events_rest_transport(sf_dir)
    )
    assert got.count() == expected.count()
    assert got.select("event_id").distinct().count() == expected.count()
    # spot-check full-row equality via anti-joins both ways
    cols = [f.name for f in EVENTS_SCHEMA.fields]
    assert got.select(cols).exceptAll(expected.select(cols)).count() == 0
    assert expected.select(cols).exceptAll(got.select(cols)).count() == 0


def test_offset_pagination_distributes(spark, sf_dir):
    got = read_http_stream(
        spark, _cfg("offset", page_size=100), events_rest_transport(sf_dir)
    )
    # page fetches run as multiple tasks, not a driver loop
    assert got.rdd.getNumPartitions() > 1


def test_token_pagination_equals_table(spark, sf_dir, expected):
    got = read_http_stream(spark, _cfg("token"), events_rest_transport(sf_dir))
    assert got.count() == expected.count()
    assert (
        got.agg(F.max("event_id")).first()[0]
        == expected.agg(F.max("event_id")).first()[0]
    )


def test_state_becomes_request_param(spark, sf_dir, expected):
    n = expected.count()
    cutoff = expected.orderBy("ts").limit(n // 2).agg(F.max("ts")).first()[0]
    got = read_http_stream(
        spark,
        _cfg("offset"),
        events_rest_transport(sf_dir),
        state={"min_ts": cutoff},
    )
    want = expected.filter(F.col("ts") >= F.lit(cutoff)).count()
    assert got.count() == want and want > 0


def test_retries_exponential_backoff():
    calls, sleeps = [], []
    def flaky(path, params):
        calls.append(path)
        if len(calls) < 3:
            raise TransportError("503")
        return {"records": [], "next_page_token": None, "total": 0}

    t = with_retries(flaky, max_tries=5, backoff_base=0.5, sleep=sleeps.append)
    assert t("events", {})["total"] == 0
    assert len(calls) == 3 and sleeps == [0.5, 1.0]


def test_retries_exhaust_raises():
    def dead(path, params):
        raise TransportError("503")

    t = with_retries(dead, max_tries=3, sleep=lambda s: None)
    with pytest.raises(TransportError):
        t("events", {})


def test_substream_children_per_parent(spark, sf_dir, expected):
    parents = expected.select("user_id").distinct().limit(8)
    cfg = HttpStreamConfig(
        name="user_events",
        path="users/{parent}/events",
        schema=EVENTS_SCHEMA,
        page_size=7,  # force multi-page per parent
    )
    got = read_http_substream(
        spark,
        parents,
        "user_id",
        cfg,
        events_rest_transport(sf_dir),
        child_parent_col="parent_user_id",
    ).cache()
    want = expected.join(parents, "user_id", "left_semi")
    assert got.count() == want.count()
    # FK stamp matches the record's own user_id on every row
    assert got.filter(F.col("parent_user_id") != F.col("user_id")).count() == 0
    got.unpersist()


def test_rate_limit_sleeps_server_advised():
    """RateLimitError sleeps exactly the server's Retry-After (≡ the cdk
    user_defined_backoff_handler), interleaved with exponential backoff
    for generic transport failures."""
    from airbyte_spark.sources.http import (
        RateLimitError,
        TransportError,
        with_retries,
    )

    fails = [RateLimitError(retry_after=7.5), TransportError("boom"),
             RateLimitError(retry_after=2.0)]
    calls = {"n": 0}

    def flaky(path, params):
        if calls["n"] < len(fails):
            calls["n"] += 1
            raise fails[calls["n"] - 1]
        return {"records": [{"ok": 1}]}

    slept = []
    t = with_retries(flaky, max_tries=5, backoff_base=0.5, sleep=slept.append)
    assert t("x", {})["records"] == [{"ok": 1}]
    assert slept == [7.5, 1.0, 2.0]  # advised, expo(attempt=1), advised


def test_non_transport_4xx_gives_up_immediately():
    from airbyte_spark.sources.http import with_retries

    calls = {"n": 0}

    def hard_404(path, params):
        calls["n"] += 1
        raise KeyError("404 not found")  # not a TransportError

    slept = []
    t = with_retries(hard_404, max_tries=5, sleep=slept.append)
    import pytest

    with pytest.raises(KeyError):
        t("x", {})
    assert calls["n"] == 1 and slept == []
