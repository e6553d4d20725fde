"""External CDC tail: drain a directory of Debezium-envelope JSONL into
the merge pipeline with a bounded stop position.

The reference's primary source is Debezium tailing a database log, with
two load-bearing semantics (bases/debezium/.../AirbyteDebeziumHandler.java:
45-112, source-postgres/.../PostgresCdcTargetPosition.java:52-71):

1. TARGET POSITION FIRST: the handler snapshots the log's current head
   BEFORE consuming, then drains only up to it — events written while the
   sync runs belong to the next sync. Re-expressed here: the position is
   the max `source.lsn` present in the tail directory at capture time,
   read by a metadata-light scan (one get_json_object — no envelope
   parse), and every micro-batch filters `lsn <= target`.
2. CHECKPOINTED EXACTLY-ONCE APPLY: the drain rides Structured Streaming
   (file-source tail of the directory, the Kafka-Connect-file wire shape)
   into `CdcPipeline.apply_batch`, whose table-transactional committed-set
   makes redelivery a no-op even if the Spark streaming checkpoint is
   lost — identical contract to `CdcPipeline.run_stream`.

The envelope→record transform is `sources/debezium.py parse_debezium`
(JVM-side from_json; malformed lines split to a dead-letter accumulator
rather than dropped). The payload on the wire is the page record with
`warc_ts_us` carried at MICROsecond precision (Debezium's MicroTimestamp
convention) so the LWW cursor survives the JSON round trip exactly;
`source.ts_ms` keeps Debezium's millisecond contract and only feeds the
informational _ab_cdc_updated_at/_deleted_at columns, never the ordering.

At 100 TB the tail is the same shape: file/topic listing on the driver,
one narrow parse stage per micro-batch, then the pipeline's O(batch)
merge. Nothing here rescans the target table.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.sources.debezium import parse_debezium, split_dead_letters
from airbyte_spark.sources.registry import register_source

__all__ = [
    "PAGE_WIRE_SCHEMA",
    "capture_target_position",
    "read_debezium_tail",
    "page_record_mapper",
    "run_debezium_tail",
    "write_debezium_tail",
    "debezium_jsonl_source",
]

# Page record as it travels inside a Debezium envelope: html as utf-8 text
# (JSON has no binary type; the mapper re-encodes), the cursor in micros.
PAGE_WIRE_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts_us", LongType(), True),
        StructField("html", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def capture_target_position(spark: SparkSession, tail_dir: str) -> int | None:
    """Max `source.lsn` currently present in the tail directory (None when
    empty) — the bounded-drain stop position, captured BEFORE consuming
    (≡ PostgresCdcTargetPosition.targetPosition). Reads only the lsn path
    out of each line; no envelope parse, no payload schema needed."""
    from pyspark.errors import AnalysisException

    try:
        raw = spark.read.text(tail_dir)
        row = raw.agg(
            F.max(
                F.get_json_object(F.col("value"), "$.source.lsn").cast("long")
            ).alias("lsn")
        ).first()
    except AnalysisException:
        return None  # tail dir absent/empty — nothing to drain yet
    return row["lsn"] if row else None


def read_debezium_tail(
    spark: SparkSession,
    tail_dir: str,
    payload_schema: StructType = PAGE_WIRE_SCHEMA,
    target_lsn: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Batch read of the tail: (records, dead_letters), records capped at
    target_lsn when given. One narrow map stage — text scan → from_json."""
    raw = spark.read.text(tail_dir)
    good, dead = split_dead_letters(
        parse_debezium(raw, payload_schema, emit_timestamps=True)
    )
    if target_lsn is not None:
        good = good.filter(F.col("_ab_cdc_lsn") <= target_lsn)
    return good, dead


def page_record_mapper(parsed: DataFrame, batch_span: int = 1_000) -> DataFrame:
    """Parsed PAGE_WIRE_SCHEMA records → the pipeline's CHANGE_SCHEMA:
    micros cursor back to timestamp_ntz, html re-encoded to binary, text
    left NULL for the extraction stage, checkpoint_id = lsn DIV span (the
    same binlog-segment rule as sources/changelog.py)."""
    return parsed.select(
        F.col("url"),
        F.timestamp_micros(F.col("warc_ts_us")).cast("timestamp_ntz").alias("warc_ts"),
        F.encode(F.col("html"), "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
        F.col("_ab_cdc_updated_at"),
        F.col("_ab_cdc_deleted_at"),
        F.col("_ab_cdc_lsn"),
        F.col("_ab_cdc_updated_at").alias("_emitted_at"),
        F.expr(f"CAST(_ab_cdc_lsn DIV {batch_span} AS BIGINT)").alias(
            "checkpoint_id"
        ),
    )


def write_debezium_tail(
    changelog: DataFrame,
    out_dir: str,
    mode: str = "append",
) -> None:
    """Serialize CHANGE_SCHEMA rows as Debezium-envelope JSONL under
    out_dir, one file per checkpoint segment — the fixture/writer side of
    the wire (tests and the gated query replay through it; a deployment
    points the tail at its Kafka-Connect file sink instead). Deletes carry
    the before-image, everything else the after-image; `op` cycles c/u for
    non-deletes off the lsn so both paths exercise."""
    payload = F.struct(
        F.col("url"),
        F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("warc_ts_us"),
        F.decode(F.col("html"), "UTF-8").alias("html"),
        F.col("lang"),
    )
    is_del = F.col("_ab_cdc_deleted_at").isNotNull()
    env = F.to_json(
        F.struct(
            F.when(is_del, payload).alias("before"),
            F.when(~is_del, payload).alias("after"),
            F.when(is_del, F.lit("d"))
            .when(F.col("_ab_cdc_lsn") % 3 == 0, F.lit("c"))
            .otherwise(F.lit("u"))
            .alias("op"),
            F.unix_millis(F.col("_ab_cdc_updated_at").cast("timestamp")).alias(
                "ts_ms"
            ),
            F.struct(
                F.unix_millis(
                    F.col("_ab_cdc_updated_at").cast("timestamp")
                ).alias("ts_ms"),
                F.col("_ab_cdc_lsn").alias("lsn"),
            ).alias("source"),
        )
    )
    (
        changelog.select(env.alias("value"), F.col("checkpoint_id"))
        .repartition("checkpoint_id")
        .select("value")
        .write.mode(mode)
        .text(out_dir)
    )


def run_debezium_tail(
    pipeline,
    tail_dir: str,
    spark_checkpoint_dir: str,
    payload_schema: StructType = PAGE_WIRE_SCHEMA,
    target_lsn: int | None = None,
    batch_span: int = 1_000,
    record_mapper=None,
    available_now: bool = True,
    max_files_per_trigger: int = 4,
):
    """Bounded streaming drain of a Debezium JSONL tail into a
    CdcPipeline. Each micro-batch: parse envelopes → drop dead letters →
    cap at target_lsn → map to CHANGE_SCHEMA → apply only the checkpoint
    segments not already committed (exactly-once via the table's
    committed-set, ≡ run_stream). Returns (query, dead_letter_dir): dead
    letters append as JSONL next to the Spark checkpoint so a dead-letter
    sink can tail them."""
    spark = pipeline.table.spark
    mapper = record_mapper or (lambda df: page_record_mapper(df, batch_span))
    dead_dir = os.path.join(spark_checkpoint_dir, "dead_letters")

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(tail_dir)
    )

    def handle(df: DataFrame, epoch_id: int) -> None:
        # parse ONCE per micro-batch and pin it: the dead-letter probe,
        # the segment listing, and the merge all read the cached parse
        # instead of re-running the text scan + from_json (at a 100 TB
        # tail the parse is the hot loop's dominant cost — it must not
        # run three times per batch)
        parsed = parse_debezium(df, payload_schema, emit_timestamps=True).persist()
        try:
            good, dead = split_dead_letters(parsed)
            if dead.limit(1).count():
                dead.write.mode("append").json(dead_dir)
            if target_lsn is not None:
                good = good.filter(F.col("_ab_cdc_lsn") <= target_lsn)
            records = mapper(good)
            cids = sorted(
                r[0] for r in records.select("checkpoint_id").distinct().collect()
            )
            pending = [
                c for c in cids if f"ckpt-{c}" not in pipeline.table.committed()
            ]
            if not pending:
                return
            pipeline.apply_batch(
                records.filter(
                    F.col("checkpoint_id").isin([int(c) for c in pending])
                ),
                checkpoint_key=[f"ckpt-{c}" for c in pending],
            )
        finally:
            parsed.unpersist()

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", spark_checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q, dead_dir
    return writer.start(), dead_dir


@register_source("debezium_jsonl")
def debezium_jsonl_source(
    tail_dir: str,
    batch_span: int = 1_000,
    target_lsn: int | None = None,
):
    """Registry plug-in: a Debezium-envelope JSONL tail as a (spark,
    state) source — the batch face of the bounded drain (the streaming
    face is run_debezium_tail). state['from_checkpoint'] resumes by
    segment like every built-in; target_lsn=None captures the position at
    read time (the handler's snapshot-then-drain rule applied per sync)."""

    def read(spark: SparkSession, state: dict) -> DataFrame:
        from airbyte_spark.sources.registry import _apply_state

        bound = (
            target_lsn
            if target_lsn is not None
            else capture_target_position(spark, tail_dir)
        )
        good, _dead = read_debezium_tail(spark, tail_dir, target_lsn=bound)
        return _apply_state(page_record_mapper(good, batch_span), state)

    return read
