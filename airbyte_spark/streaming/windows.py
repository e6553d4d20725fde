"""Event-time windowed aggregation over the change stream, with watermarks.

The reference accounts for a sync's progress with wall-clock counters
flushed per state message (`BufferedStreamConsumer.java:166-174`,
`airbyte_protocol.yaml:67-76` AirbyteStateMessage + record counts). A
Spark-native engine gets a strictly stronger form for free from Structured
Streaming: EVENT-TIME windowed metrics with a watermark, so late change
events (out-of-order binlog segments, delayed partitions) are folded into
the window they belong to — up to the allowed lateness — instead of the
window in which they happened to arrive, and state for closed windows is
dropped bounded by the watermark (no unbounded streaming state at 10^10
events).

Batch and streaming share one definition: `windowed_event_metrics` builds
the same logical plan over either a static or a streaming DataFrame (the
watermark is a no-op in batch mode, per Spark semantics), so the oracle-
checked batch query and the `readStream` pipeline cannot drift apart.

Scale notes (100 TB): the aggregation is a hash-partial + final over
(window, lang) — map-side combine collapses each input partition to
O(windows × langs) rows before the shuffle, and `approx_count_distinct`
(HLL sketch, mergeable) keeps per-group state constant-size where an exact
distinct would shuffle every url. Exact distinct is kept for the batch /
oracle form only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import TimestampNTZType, TimestampType


def windowed_event_metrics(
    changelog: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    time_col: str = "warc_ts",
    exact_distinct: bool | None = None,
) -> DataFrame:
    """Per event-time window: event/delete counts, url cardinality, lsn max.

    exact_distinct=None picks exact counting for batch inputs (oracle-
    comparable) and the mergeable HLL sketch for streaming inputs (bounded
    per-window state); pass True/False to force either.
    """
    if exact_distinct is None:
        exact_distinct = not changelog.isStreaming
    df = changelog
    if df.isStreaming:
        # Watermarks require TIMESTAMP (ltz); the changelog schema is NTZ
        # (wall-clock warc capture time). Reinterpret in the session tz —
        # the engine pins spark.sql.session.timeZone=UTC so this is lossless.
        if isinstance(df.schema[time_col].dataType, TimestampNTZType):
            df = df.withColumn(time_col, F.col(time_col).cast(TimestampType()))
        df = df.withWatermark(time_col, watermark_delay)
    n_urls = (
        F.count_distinct(F.col("url")) if exact_distinct
        else F.approx_count_distinct("url")
    )
    return (
        df.groupBy(F.window(F.col(time_col), window_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("_ab_cdc_deleted_at").isNotNull(), 1).otherwise(0)
            ).alias("n_deletes"),
            n_urls.alias("n_urls"),
            F.max("_ab_cdc_lsn").alias("max_lsn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "n_deletes",
            "n_urls",
            "max_lsn",
        )
    )


def streaming_session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Gap sessionization as a STREAMING aggregate: Spark's built-in
    `session_window` (dynamic-gap merge inside the state store) keyed on
    `key`, closed and emitted once the watermark passes session_end + gap
    — the streaming sibling of operators/temporal.session_stats, which is
    the batch oracle for it (same key/ts/gap → same (start, end, count)
    rollups for every session the watermark has closed).

    Spark-first on purpose: no custom applyInPandasWithState loop — the
    built-in operator gives merge-on-overlap semantics, bounded state
    (watermark GC), and append-mode emission for free. State per open
    session is O(aggregates), not O(events), so 10^9 concurrent sessions
    are executor-memory-shaped. Late rows inside the watermark merge into
    (or bridge) their session; later ones are dropped, bounded — the
    exact late-data contract windowed_event_metrics documents.

    Streaming watermarks require TimestampType, so an NTZ event-time
    column is cast in — and the emitted session bounds are cast BACK to
    timestamp_ntz. The round trip runs in the one session timezone, so
    batch (NTZ end-to-end) and streaming agree in ANY session timezone,
    not just UTC; the sole caveat is wall-clock values that a DST gap
    makes nonexistent in the session zone, which no NTZ cursor in this
    engine produces."""
    was_ntz = False
    if df.isStreaming:
        if isinstance(df.schema[ts].dataType, TimestampNTZType):
            was_ntz = True
            df = df.withColumn(ts, F.col(ts).cast(TimestampType()))
        df = df.withWatermark(ts, watermark_delay)
    bound_t = TimestampNTZType() if was_ntz else None
    return (
        df.groupBy(
            F.session_window(F.col(ts), f"{gap_seconds} seconds").alias("sw"),
            F.col(key),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            (
                F.col("sw.start").cast(bound_t) if bound_t
                else F.col("sw.start")
            ).alias("session_start"),
            (
                F.col("sw.end").cast(bound_t) if bound_t
                else F.col("sw.end")
            ).alias("session_end"),
            "n_events",
        )
    )
