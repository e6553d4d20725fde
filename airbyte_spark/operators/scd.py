"""SCD Type-2 history materialization — the reference's `<stream>_scd`
table (base-normalization stream_processor.py:635-813) re-expressed as one
window pass over the change stream.

Every change event becomes a history row with its validity interval:
  _start_at    = event cursor (warc_ts)
  _end_at      = next-newer version's cursor (lag over the dedup window)
  _active_row  = newest version per key AND not a tombstone

The reference recomputes SCD incrementally per sync (touch-only-affected-
keys); here the engine's target table already holds the active rows, so the
SCD table is an append-only log derived per micro-batch: new events append
history rows, and rows they supersede get their _end_at closed by a MERGE
on (key, _end_at IS NULL). For the batch/oracle path this module offers the
one-shot window form; `scd_append_batch` is the incremental form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from airbyte_spark.protocol import StreamConfig


def scd_history(changes: DataFrame, cfg: StreamConfig) -> DataFrame:
    """One-shot SCD2 over a full change stream (oracle-checkable form)."""
    key = cfg.primary_key[0]
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc_nulls_last() for c in cfg.order_cols]
    )
    return changes.select(
        F.col(key),
        F.col(cfg.cursor_field).alias("_start_at"),
        F.lag(cfg.cursor_field).over(w).alias("_end_at"),
        (
            (F.row_number().over(w) == 1) & F.col(cfg.deleted_at_field).isNull()
        ).alias("_active_row"),
        *[F.col(c) for c in changes.columns if c not in (key,)],
    )


def scd_append_batch(
    existing_scd: DataFrame, batch: DataFrame, cfg: StreamConfig
) -> DataFrame:
    """Incremental SCD2: merge a new (possibly multi-version) batch into an
    existing history table. Open rows whose key receives newer versions get
    closed; batch rows get intervals among themselves. Pure-DataFrame form
    (union + one window), mirroring the engine merge's single-shuffle shape.
    """
    key = cfg.primary_key[0]
    cols = [key, cfg.cursor_field, cfg.deleted_at_field, *cfg.order_tiebreakers]
    e = existing_scd.select(
        *cols, F.lit(0).alias("_is_batch"), F.col("_start_at"), F.col("_end_at")
    )
    b = batch.select(
        *cols,
        F.lit(1).alias("_is_batch"),
        F.col(cfg.cursor_field).alias("_start_at"),
        F.lit(None).cast("timestamp_ntz").alias("_end_at"),
    )
    both = e.unionByName(b)
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc_nulls_last() for c in cfg.order_cols]
    )
    return both.select(
        F.col(key),
        F.col("_start_at"),
        # an existing closed row keeps its _end_at; open/new rows get the
        # next-newer version's start
        F.coalesce(F.col("_end_at"), F.lag("_start_at").over(w)).alias("_end_at"),
        ((F.row_number().over(w) == 1) & F.col(cfg.deleted_at_field).isNull()).alias(
            "_active_row"
        ),
        *[F.col(c) for c in cols if c != key],
    )
