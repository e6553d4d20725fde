"""Singer-tap message adapter — the legacy JSONL protocol as DataFrames.

A Singer tap emits one JSON message per line on stdout: SCHEMA (a JSON
Schema for a stream), RECORD (one row), STATE (a resumption cursor). The
reference bridges taps by line-parsing that stdout into its own message
types (airbyte-cdk/python/airbyte_cdk/sources/singer/singer_helpers.py:
162-219 `SingerHelper.read` / `_airbyte_message_from_json`: SCHEMA
dropped, RECORD→record, STATE→state).

Spark-first restatement: a tap's captured output is just a JSONL dataset,
so the adapter is a *distributed parser*, not a subprocess pump —

  * `read_singer_records` line-filters RECORD messages for one stream and
    parses payloads with `from_json` against a typed schema: the entire
    parse is JVM-side column work over however many files/partitions the
    capture spans (a 100 TB tap archive parses as a normal Spark scan —
    predicate pushdown on the cheap `type`/`stream` prefilter, then typed
    extraction).
  * The stream's Spark schema comes from its SCHEMA message
    (`singer_schema_to_spark`, ≡ singer_helpers.py:101-134
    singer_catalog_to_airbyte_catalog's json-schema pass-through) or can
    be supplied explicitly.
  * `last_singer_state` recovers the newest STATE message — the resume
    cursor the reference forwards as AirbyteStateMessage.
  * `write_singer` is the inverse (a tap emitter): RECORD lines from a
    DataFrame via `to_json`, SCHEMA/STATE bookends — so the adapter
    round-trips and any Singer-consuming tool can read engine output.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

_JSON_TYPE_MAP: dict[str, DataType] = {
    "string": StringType(),
    "integer": LongType(),
    "number": DoubleType(),
    "boolean": BooleanType(),
}


def singer_schema_to_spark(json_schema: dict) -> StructType:
    """JSON Schema (the SCHEMA message payload) → Spark StructType.

    Handles the shapes taps actually emit: type unions with "null",
    date-time formats, nested objects (recursed), arrays degraded to
    string (normalization explodes them later via operators/unnest).
    """
    fields = []
    for name, prop in (json_schema.get("properties") or {}).items():
        t = prop.get("type", "string")
        types = [x for x in (t if isinstance(t, list) else [t]) if x != "null"]
        jt = types[0] if types else "string"
        if jt == "object":
            dt: DataType = singer_schema_to_spark(prop)
        elif jt == "string" and prop.get("format") == "date-time":
            dt = TimestampNTZType()
        else:
            dt = _JSON_TYPE_MAP.get(jt, StringType())
        fields.append(StructField(name, dt, True))
    return StructType(fields)


def _messages(spark: SparkSession, path: "str | list[str]") -> DataFrame:
    """Raw tap output with a stable per-file line order.

    monotonically_increasing_id embeds (partition, offset); partitions of
    a single text file are file-offset ordered, so (file, id) sorts lines
    the way the tap emitted them — which is what STATE recency means.
    """
    return (
        spark.read.text(path)
        .select(
            F.col("value"),
            F.input_file_name().alias("_file"),
            F.monotonically_increasing_id().alias("_line"),
            F.get_json_object("value", "$.type").alias("_type"),
            F.get_json_object("value", "$.stream").alias("_stream"),
        )
    )


def singer_stream_schema(spark: SparkSession, path: str, stream: str) -> StructType:
    rows = (
        _messages(spark, path)
        .filter((F.col("_type") == "SCHEMA") & (F.col("_stream") == stream))
        .select("value")
        .limit(1)
        .collect()
    )
    if not rows:
        raise ValueError(f"no SCHEMA message for stream '{stream}' in {path}")
    return singer_schema_to_spark(json.loads(rows[0]["value"])["schema"])


def read_singer_records(
    spark: SparkSession,
    path: str,
    stream: str,
    schema: StructType | None = None,
) -> DataFrame:
    """RECORD messages of one stream, typed. Fully distributed parse."""
    if schema is None:
        schema = singer_stream_schema(spark, path, stream)
    msgs = _messages(spark, path)
    return (
        msgs.filter((F.col("_type") == "RECORD") & (F.col("_stream") == stream))
        .select(F.from_json(F.get_json_object("value", "$.record"), schema).alias("r"))
        .select("r.*")
    )


def last_singer_state(spark: SparkSession, path: str) -> dict | None:
    rows = (
        _messages(spark, path)
        .filter(F.col("_type") == "STATE")
        .orderBy(F.col("_file").desc(), F.col("_line").desc())
        .select("value")
        .limit(1)
        .collect()
    )
    return json.loads(rows[0]["value"])["value"] if rows else None


def write_singer(
    df: DataFrame,
    path: str,
    stream: str,
    key_properties: list[str] | None = None,
    state: dict | None = None,
) -> None:
    """Emit a DataFrame as a Singer message file set.

    records/ holds the distributed RECORD lines (one text part per task —
    Singer consumers concatenate); 00_schema.jsonl / zz_state.jsonl bookend
    them so (file, line) ordering replays SCHEMA → RECORDs → STATE.
    """
    os.makedirs(path, exist_ok=True)
    json_schema = {
        "type": "object",
        "properties": {
            f.name: _spark_field_to_json_schema(f.dataType) for f in df.schema.fields
        },
    }
    with open(os.path.join(path, "00_schema.jsonl"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "type": "SCHEMA",
                    "stream": stream,
                    "schema": json_schema,
                    "key_properties": key_properties or [],
                }
            )
            + "\n"
        )
    ts_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)
    ]
    rec = df
    for c in ts_cols:
        # ISO-8601 the way taps emit date-times (to_json would also, but
        # pinning the format here keeps the round-trip byte-stable)
        rec = rec.withColumn(c, F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    lines = rec.select(
        F.concat(
            F.lit('{"type": "RECORD", "stream": "%s", "record": ' % stream),
            F.to_json(F.struct(*[F.col(f.name) for f in df.schema.fields])),
            F.lit("}"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(os.path.join(path, "records"))
    if state is not None:
        with open(os.path.join(path, "zz_state.jsonl"), "w") as fh:
            fh.write(json.dumps({"type": "STATE", "value": state}) + "\n")


def _spark_field_to_json_schema(dt: DataType) -> dict:
    if isinstance(dt, LongType):
        return {"type": ["null", "integer"]}
    if isinstance(dt, DoubleType):
        return {"type": ["null", "number"]}
    if isinstance(dt, BooleanType):
        return {"type": ["null", "boolean"]}
    if isinstance(dt, TimestampNTZType):
        return {"type": ["null", "string"], "format": "date-time"}
    if isinstance(dt, StructType):
        return {
            "type": ["null", "object"],
            "properties": {
                f.name: _spark_field_to_json_schema(f.dataType) for f in dt.fields
            },
        }
    return {"type": ["null", "string"]}


def singer_glob(path: str) -> list[str]:
    """Read-side paths covering the bookend files and the records dir
    (spark.read.text takes the list)."""
    return [f"{path}/*.jsonl", f"{path}/records"]
