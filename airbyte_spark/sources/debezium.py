"""Debezium change-event envelope → change-record transform.

The reference consumes raw Debezium JSON envelopes and flattens them into
Airbyte records (`bases/debezium/.../DebeziumEventUtils.java:22-65`):

  record  = after      when op in (c, u, r)   [r = snapshot read]
          = before     when op = d            (delete keeps the key image)
  _ab_cdc_updated_at = source.ts_ms  (source transaction timestamp)
  _ab_cdc_deleted_at = source.ts_ms  when op = d else NULL
  _ab_cdc_lsn        = source.lsn    (PostgresCdcTargetPosition.java:52-71)

This module restates that transform as pure column expressions over a
DataFrame holding raw envelope strings: `from_json` with an explicit
envelope schema (JVM-side, whole-stage codegen — no Python in the path),
then a `when(op = 'd', before).otherwise(after)` struct pick and a star
expansion. Malformed envelopes surface as a NULL parsed struct and are
split out for a dead-letter sink rather than silently dropped (≡ the
reference's record validity filter, BufferedStreamConsumer.java:141-144).

At 100 TB the entire parse is one narrow map stage: no shuffle, filter
pushdown unaffected upstream, and the envelope schema keeps column pruning
effective (only `before`/`after` fields actually referenced downstream are
materialized by the parquet/Kafka scan when the source supports it).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["envelope_schema", "parse_debezium", "split_dead_letters"]


def envelope_schema(payload_schema: StructType) -> StructType:
    """Debezium envelope for a given payload row schema.

    ≡ the event shape DebeziumEventUtils reads: before/after row images,
    `op` (c/u/d/r), event `ts_ms`, and the `source` block carrying the
    log position (lsn) and source transaction time."""
    return StructType(
        [
            StructField("before", payload_schema, True),
            StructField("after", payload_schema, True),
            StructField("op", StringType(), True),
            StructField("ts_ms", LongType(), True),
            StructField(
                "source",
                StructType(
                    [
                        StructField("ts_ms", LongType(), True),
                        StructField("lsn", LongType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


def parse_debezium(
    df: DataFrame,
    payload_schema: StructType,
    value_col: str = "value",
    emit_timestamps: bool = False,
) -> DataFrame:
    """Flatten raw Debezium JSON envelopes into change records.

    Output columns: the payload fields (from `after`, or `before` for
    deletes — a tombstone carries the key image, DebeziumEventUtils.java:
    46-58), `_ab_cdc_updated_at_ms`, `_ab_cdc_deleted_at_ms`, `_ab_cdc_lsn`,
    plus `_corrupt` (true when the envelope failed to parse — route those
    to a dead-letter sink with split_dead_letters). With
    `emit_timestamps=True` the *_ms columns are additionally converted to
    timestamp_ntz columns named like the engine's CHANGE_SCHEMA
    (_ab_cdc_updated_at / _ab_cdc_deleted_at) for direct merge ingestion.
    """
    env = F.from_json(F.col(value_col), envelope_schema(payload_schema))
    d = df.withColumn("_env", env)
    is_delete = F.col("_env.op") == "d"
    # source.ts_ms is the transaction time; fall back to event ts_ms when a
    # connector omits the source block (same precedence the reference uses).
    src_ts = F.coalesce(F.col("_env.source.ts_ms"), F.col("_env.ts_ms"))
    # Per-field image pick (not CASE over whole structs): GetStructField
    # reaches the from_json directly, so Catalyst prunes the parse schema
    # to the payload fields a downstream select actually references —
    # unreferenced columns are never even parsed out of the JSON.
    out = d.select(
        *[
            F.when(is_delete, F.col(f"_env.before.{f.name}"))
            .otherwise(F.col(f"_env.after.{f.name}"))
            .alias(f.name)
            for f in payload_schema.fields
        ],
        src_ts.alias("_ab_cdc_updated_at_ms"),
        F.when(is_delete, src_ts).alias("_ab_cdc_deleted_at_ms"),
        F.col("_env.source.lsn").alias("_ab_cdc_lsn"),
        # corrupt ⇔ the envelope parsed to nothing usable: no op at all
        (F.col("_env").isNull() | F.col("_env.op").isNull()).alias("_corrupt"),
    )
    if emit_timestamps:
        out = out.withColumn(
            "_ab_cdc_updated_at",
            F.timestamp_millis(F.col("_ab_cdc_updated_at_ms")).cast("timestamp_ntz"),
        ).withColumn(
            "_ab_cdc_deleted_at",
            F.timestamp_millis(F.col("_ab_cdc_deleted_at_ms")).cast("timestamp_ntz"),
        )
    return out


def split_dead_letters(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead) split on the _corrupt marker — the reference counts and
    drops invalid records per stream (BufferedStreamConsumer.java:141-144,
    195-196); we keep them addressable instead of only counted."""
    good = parsed.filter(~F.col("_corrupt")).drop("_corrupt")
    dead = parsed.filter(F.col("_corrupt")).drop("_corrupt")
    return good, dead
