"""Singer-tap adapter: schema mapping, record parse, state, round-trip."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructType,
    TimestampNTZType,
)

from airbyte_spark.sources.singer import (
    last_singer_state,
    read_singer_records,
    singer_glob,
    singer_schema_to_spark,
    singer_stream_schema,
    write_singer,
)


def test_json_schema_mapping():
    st = singer_schema_to_spark(
        {
            "type": "object",
            "properties": {
                "id": {"type": ["null", "integer"]},
                "amount": {"type": "number"},
                "name": {"type": ["null", "string"]},
                "at": {"type": ["null", "string"], "format": "date-time"},
                "nested": {
                    "type": ["null", "object"],
                    "properties": {"k": {"type": "string"}},
                },
            },
        }
    )
    by = {f.name: f.dataType for f in st.fields}
    assert isinstance(by["id"], LongType)
    assert isinstance(by["amount"], DoubleType)
    assert isinstance(by["name"], StringType)
    assert isinstance(by["at"], TimestampNTZType)
    assert isinstance(by["nested"], StructType)


def _write_tap_output(tmp_path):
    """Hand-written tap stdout capture: SCHEMA, RECORDs, STATEs."""
    lines = [
        {
            "type": "SCHEMA",
            "stream": "users",
            "schema": {
                "type": "object",
                "properties": {
                    "id": {"type": "integer"},
                    "email": {"type": "string"},
                    "score": {"type": ["null", "number"]},
                },
            },
            "key_properties": ["id"],
        },
        {"type": "RECORD", "stream": "users", "record": {"id": 1, "email": "a@x", "score": 0.5}},
        {"type": "STATE", "value": {"users": {"id": 1}}},
        {"type": "RECORD", "stream": "users", "record": {"id": 2, "email": "b@x", "score": None}},
        {"type": "RECORD", "stream": "other", "record": {"id": 99}},
        {"type": "STATE", "value": {"users": {"id": 2}}},
    ]
    p = tmp_path / "tap.jsonl"
    p.write_text("".join(json.dumps(x) + "\n" for x in lines))
    return str(p)


def test_read_records_and_schema_and_state(spark, tmp_path):
    path = _write_tap_output(tmp_path)
    schema = singer_stream_schema(spark, path, "users")
    assert [f.name for f in schema.fields] == ["id", "email", "score"]
    df = read_singer_records(spark, path, "users")
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [1, 2]
    assert rows[0]["email"] == "a@x" and rows[1]["score"] is None
    assert last_singer_state(spark, path) == {"users": {"id": 2}}


def test_roundtrip_write_then_read(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "tap_out")
    write_singer(
        src, out, "events", key_properties=["event_id"], state={"events": {"max": 1}}
    )
    back = read_singer_records(spark, singer_glob(out), "events")
    assert back.count() == src.count()
    assert {f.name for f in back.schema.fields} == set(src.columns)
    # typed round-trip: numeric aggregate and timestamp max survive
    assert (
        back.agg(F.sum("event_id")).first()[0]
        == src.agg(F.sum("event_id")).first()[0]
    )
    assert (
        back.agg(F.max("ts")).first()[0] == src.agg(F.max("ts")).first()[0]
    )
    assert last_singer_state(spark, singer_glob(out)) == {"events": {"max": 1}}
