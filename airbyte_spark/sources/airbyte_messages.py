"""AirbyteMessage JSONL adapter — the reference's wire protocol as a
source and sink.

Every reference connector speaks newline-delimited AirbyteMessage JSON on
stdout/stdin (airbyte-protocol/.../airbyte_protocol.yaml: RECORD / STATE /
LOG envelopes; entrypoint.py serializes, destinations parse). This module
makes the engine interoperable with that stream in both directions,
entirely JVM-side:

  read_airbyte_messages   JSONL file(s) → (typed records DataFrame,
                          last STATE dict) — distributed parse via
                          get_json_object + from_json; LOG/TRACE lines
                          ignored, exactly like a destination's consumer.
  to_airbyte_messages     records DataFrame → one RECORD envelope per row
                          (to_json, codegen'd) for handing to any
                          protocol-speaking destination.
  write_airbyte_messages  sink: RECORD lines + one trailing STATE line
                          (the checkpoint contract: a state message
                          covers every record before it).

State semantics: the protocol orders messages within the stream; a batch
read takes the LAST state as the resume checkpoint. JSON line files parse
per-partition in file order, so the maximum (file, line) position wins —
tracked with the input file name + a per-partition line index, no driver
pass over the data.
"""

from __future__ import annotations

import json
import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from airbyte_spark.sources.registry import register_source


def to_airbyte_messages(
    df: DataFrame,
    stream: str,
    emitted_at_col: str | None = None,
    namespace: str | None = None,
) -> DataFrame:
    """One RECORD envelope per row: {"type":"RECORD","record":{"stream",
    "namespace","emitted_at" (epoch ms),"data":{...}}}. Pure to_json —
    fused into the upstream plan, no UDF, no shuffle."""
    data_cols = [c for c in df.columns if c != emitted_at_col]
    emitted = (
        (F.unix_millis(F.col(emitted_at_col).cast("timestamp")))
        if emitted_at_col is not None
        else F.unix_millis(F.current_timestamp())
    )
    rec = F.struct(
        F.lit(stream).alias("stream"),
        F.lit(namespace).alias("namespace"),
        emitted.alias("emitted_at"),
        F.struct(*[F.col(c) for c in data_cols]).alias("data"),
    )
    return df.select(
        F.to_json(
            F.struct(F.lit("RECORD").alias("type"), rec.alias("record")),
            {"ignoreNullFields": "false"},
        ).alias("value")
    )


def write_airbyte_messages(
    df: DataFrame,
    out_dir: str,
    stream: str,
    state: dict | None = None,
    emitted_at_col: str | None = None,
) -> str:
    """Write the RECORD lines (distributed text write) plus one trailing
    STATE file — the protocol's 'state covers everything before it'
    checkpoint. Returns the output directory."""
    to_airbyte_messages(df, stream, emitted_at_col).write.mode("overwrite").text(
        out_dir
    )
    if state is not None:
        # one driver-side line: states are checkpoint-sized by contract.
        # 'zz-' prefix: spark lists part files lexicographically, so the
        # state sorts (and therefore parses) after every record part.
        p = os.path.join(out_dir, f"zz-state-{uuid.uuid4().hex[:8]}.txt")
        with open(p, "w") as fh:
            fh.write(json.dumps({"type": "STATE", "state": {"data": state}}) + "\n")
    return out_dir


def read_airbyte_messages(
    spark: SparkSession,
    path: str,
    schema: StructType,
    stream: str | None = None,
) -> "tuple[DataFrame, dict | None]":
    """Parse an AirbyteMessage JSONL directory/file into typed records +
    the last STATE (resume checkpoint), ≡ a destination's consumer loop.

    Records: `$.record.data` is extracted raw then from_json'd with the
    declared schema (the configured catalog's stream schema — exactly how
    the reference types incoming data); rows of other streams and
    non-RECORD lines drop out. Malformed data yields NULL-field rows
    rather than killing the sync (dead-letter them downstream with the
    jsonschema validator). State: last (file, line) position wins.

    STATE-ordering contract: "last" is decided by DESCENDING LEXICOGRAPHIC
    file name, then line order within the file. That is correct for this
    engine's own capture layout (a single capture file, or the writer's
    zz- prefixed state file sorting last) and for any single-file JSONL
    capture. A multi-file EXTERNAL capture whose chronological order
    disagrees with file-name order (e.g. part-10 written before part-9)
    recovers the wrong checkpoint — name files so lexicographic order is
    chronological, or concatenate before reading."""
    raw = spark.read.text(path).select(
        F.col("value"),
        F.input_file_name().alias("_f"),
    )
    typed = raw.withColumn("_t", F.get_json_object("value", "$.type"))
    recs = typed.filter(F.col("_t") == "RECORD")
    if stream is not None:
        recs = recs.filter(
            F.get_json_object("value", "$.record.stream") == stream
        )
    records = recs.select(
        F.from_json(F.get_json_object("value", "$.record.data"), schema).alias("d"),
        F.get_json_object("value", "$.record.emitted_at")
        .try_cast("bigint")
        .alias("_emitted_ms"),
    ).select(
        "d.*",
        F.timestamp_millis(F.col("_emitted_ms"))
        .cast("timestamp_ntz")
        .alias("_emitted_at"),
    )
    # last state wins: order by (file name, in-partition line index) —
    # text partitions preserve line order, files list lexicographically
    states = (
        typed.filter(F.col("_t") == "STATE")
        .withColumn("_pos", F.monotonically_increasing_id())
        .select("value", "_f", "_pos")
        .orderBy(F.col("_f").desc(), F.col("_pos").desc())
        .limit(1)
        .collect()
    )
    state = None
    if states:
        doc = json.loads(states[0]["value"])
        state = (doc.get("state") or {}).get("data")
    return records, state


@register_source("airbyte_jsonl")
def airbyte_jsonl_source(path: str, schema_ddl: str, stream: str | None = None):
    """Registry plug-in: any AirbyteMessage JSONL stream as a (spark,
    state) source — the adapter that lets this engine consume a REAL
    Airbyte connector's stdout capture unchanged."""

    def read(spark: SparkSession, state: dict) -> DataFrame:
        records, _ = read_airbyte_messages(
            spark, path, StructType.fromDDL(schema_ddl), stream=stream
        )
        cursor = state.get("cursor_value") if state else None
        if cursor is not None:
            records = records.filter(F.col("_emitted_at") > F.lit(cursor))
        return records

    return read
