"""Debezium envelope parse: image pick, CDC metadata, dead letters.

≡ reference DebeziumEventUtils.toAirbyteMessage (bases/debezium/.../
DebeziumEventUtils.java:22-65): after-image for c/u/r, before-image for d,
_ab_cdc_updated_at from source tx time, deleted_at set only on deletes,
lsn injected from the source block.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from airbyte_spark.sources.debezium import parse_debezium, split_dead_letters

PAYLOAD = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
    ]
)


def _env(before, after, op, ts_ms, source=True, lsn=7):
    src = f',"source":{{"ts_ms":{ts_ms + 1},"lsn":{lsn}}}' if source else ""
    return f'{{"before":{before},"after":{after},"op":"{op}","ts_ms":{ts_ms}{src}}}'


def test_image_pick_and_metadata(spark):
    rows = [
        (_env("null", '{"id":1,"name":"a"}', "c", 1000),),           # insert
        (_env('{"id":1,"name":"a"}', '{"id":1,"name":"b"}', "u", 2000),),  # update
        (_env('{"id":1,"name":"b"}', "null", "d", 3000),),           # delete
        (_env("null", '{"id":2,"name":"x"}', "r", 4000),),           # snapshot read
    ]
    df = spark.createDataFrame(rows, "value string")
    good, dead = split_dead_letters(parse_debezium(df, PAYLOAD))
    assert dead.count() == 0
    got = {(r["id"], r["name"], r["_ab_cdc_deleted_at_ms"] is not None) for r in good.collect()}
    # delete keeps the before-image key; others keep after
    assert got == {(1, "a", False), (1, "b", False), (1, "b", True), (2, "x", False)}
    # source.ts_ms (tx time) wins over event ts_ms
    upd = {r["_ab_cdc_updated_at_ms"] for r in good.collect()}
    assert upd == {1001, 2001, 3001, 4001}
    assert {r["_ab_cdc_lsn"] for r in good.collect()} == {7}


def test_ts_fallback_without_source_block(spark):
    df = spark.createDataFrame(
        [(_env("null", '{"id":9,"name":"z"}', "c", 5000, source=False),)],
        "value string",
    )
    good, _ = split_dead_letters(parse_debezium(df, PAYLOAD))
    r = good.collect()[0]
    assert r["_ab_cdc_updated_at_ms"] == 5000  # event ts_ms fallback
    assert r["_ab_cdc_lsn"] is None


def test_dead_letter_routing(spark):
    rows = [
        (_env("null", '{"id":1,"name":"a"}', "c", 1000),),
        ('{"oops"',),            # malformed JSON
        ('{"before":null,"after":null,"ts_ms":1}',),  # valid JSON, no op
    ]
    df = spark.createDataFrame(rows, "value string")
    good, dead = split_dead_letters(parse_debezium(df, PAYLOAD))
    assert good.count() == 1
    assert dead.count() == 2
    assert "_corrupt" not in good.columns


def test_emit_timestamps_types(spark):
    df = spark.createDataFrame(
        [(_env('{"id":3,"name":"t"}', "null", "d", 1704067200000, source=False),)],
        "value string",
    )
    parsed = parse_debezium(df, PAYLOAD, emit_timestamps=True)
    fields = dict(parsed.dtypes)
    assert fields["_ab_cdc_updated_at"] == "timestamp_ntz"
    assert fields["_ab_cdc_deleted_at"] == "timestamp_ntz"
    r = parsed.collect()[0]
    assert r["_ab_cdc_updated_at"].isoformat() == "2024-01-01T00:00:00"
    assert r["_ab_cdc_deleted_at"] == r["_ab_cdc_updated_at"]


def test_parse_is_one_narrow_stage(spark):
    """The whole envelope flatten is map-side column expressions: one
    whole-stage-codegen project over the scan, zero shuffles — at 10^10
    events the parse adds no exchange of its own."""
    df = spark.createDataFrame(
        [(_env("null", '{"id":1,"name":"a"}', "c", 1000),)], "value string"
    )
    out = parse_debezium(df, PAYLOAD)
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in physical
    assert physical.count("from_json") <= 1  # parsed once, not per column
