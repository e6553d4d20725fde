"""AirbyteMessage JSONL adapter: round-trip, state checkpoint, consumer
tolerance (LOG lines, foreign streams, malformed data)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql.types import StructType

from airbyte_spark.sources.airbyte_messages import (
    read_airbyte_messages,
    to_airbyte_messages,
    write_airbyte_messages,
)

DDL = "event_id bigint, event_type string, value double"


def _src(spark, sf_dir, n=500):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "value", "ts")
        .limit(n)
    )


def test_roundtrip_records_and_state(spark, sf_dir, tmp_path):
    src = _src(spark, sf_dir)
    out = str(tmp_path / "msgs")
    write_airbyte_messages(
        src, out, "events", state={"cursor_value": "2024-02-01"},
        emitted_at_col="ts",
    )
    records, state = read_airbyte_messages(
        spark, out, StructType.fromDDL(DDL), stream="events"
    )
    assert state == {"cursor_value": "2024-02-01"}
    got = {
        (r["event_id"], r["event_type"], r["value"]) for r in records.collect()
    }
    want = {
        (r["event_id"], r["event_type"], r["value"])
        for r in src.drop("ts").collect()
    }
    assert got == want
    # emitted_at round-trips through epoch millis (the protocol's unit —
    # sub-millisecond precision truncates by contract)
    back = records.select(F.max("_emitted_at")).first()[0]
    orig = src.select(F.max(F.col("ts").cast("timestamp_ntz"))).first()[0]
    assert back == orig.replace(microsecond=orig.microsecond // 1000 * 1000)


def test_consumer_ignores_logs_and_foreign_streams(spark, tmp_path):
    out = str(tmp_path / "mixed")
    os.makedirs(out)
    lines = [
        {"type": "LOG", "log": {"level": "INFO", "message": "hello"}},
        {"type": "RECORD", "record": {"stream": "events", "emitted_at": 1000,
                                      "data": {"event_id": 1, "event_type": "a", "value": 1.5}}},
        {"type": "RECORD", "record": {"stream": "other", "emitted_at": 1000,
                                      "data": {"event_id": 99, "event_type": "x", "value": 0.0}}},
        {"type": "RECORD", "record": {"stream": "events", "emitted_at": 2000,
                                      "data": "not an object"}},
        {"type": "STATE", "state": {"data": {"cursor_value": 7}}},
        {"type": "STATE", "state": {"data": {"cursor_value": 9}}},
    ]
    with open(os.path.join(out, "part-0.txt"), "w") as fh:
        for line in lines:
            fh.write(json.dumps(line) + "\n")
    records, state = read_airbyte_messages(
        spark, out, StructType.fromDDL(DDL), stream="events"
    )
    rows = records.collect()
    assert state == {"cursor_value": 9}  # LAST state wins
    assert len(rows) == 2  # log + foreign stream dropped
    ok = [r for r in rows if r["event_id"] == 1][0]
    assert (ok["event_type"], ok["value"]) == ("a", 1.5)
    # malformed data → NULL-field row, not a crash (dead-letter downstream)
    bad = [r for r in rows if r["event_id"] is None][0]
    assert bad["event_type"] is None


def test_registry_source_with_cursor_state(spark, sf_dir, tmp_path):
    from airbyte_spark.sources.registry import source_factory

    src = _src(spark, sf_dir, n=300)
    out = str(tmp_path / "msgs2")
    write_airbyte_messages(src, out, "events", emitted_at_col="ts")
    mid = (
        src.select(F.col("ts").cast("timestamp_ntz").alias("t"))
        .orderBy("t")
        .limit(150)
        .agg(F.max("t"))
        .first()[0]
    )
    read = source_factory("airbyte_jsonl")(path=out, schema_ddl=DDL, stream="events")
    full = read(spark, {})
    incr = read(spark, {"cursor_value": mid})
    assert incr.count() == src.filter(F.col("ts").cast("timestamp_ntz") > mid).count()
    assert full.count() == 300


def test_cli_emit_messages_roundtrip(spark, sf_dir, tmp_path):
    """CLI: lake table → message stream; the state line carries the
    table's resume position."""
    from argparse import Namespace

    from airbyte_spark.cli import run
    from airbyte_spark.lake.format import LakeTable, PartitionSpec

    src = _src(spark, sf_dir, n=200).drop("ts")
    t = LakeTable.create(spark, str(tmp_path / "t"), src.schema, PartitionSpec())
    t.append(src, checkpoint_key="ck-0")
    out = str(tmp_path / "msgs")
    res = run(spark, Namespace(cmd="emit-messages", target=str(tmp_path / "t"),
                               out=out, stream="events"))
    assert res["records"] == 200
    records, state = read_airbyte_messages(
        spark, out, StructType.fromDDL(DDL), stream="events"
    )
    assert records.count() == 200
    assert state["table_version"] == t.current_version()
    assert "ck-0" in state["committed"]
