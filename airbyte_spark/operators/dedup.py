"""Window-ranked micro-batch dedup — the heart of append_dedup semantics.

Re-expresses the reference's SCD active-row / dedup windows
(base-normalization stream_processor.py:695-747):

  row_number() OVER (PARTITION BY pk
                     ORDER BY cursor DESC NULLS LAST, emitted DESC, lsn DESC) = 1

keeps exactly the latest version of each key inside a batch — including a
tombstone if the delete is the latest event (delete-then-reinsert within
one batch resolves correctly because ordering is total via the LSN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from airbyte_spark.protocol import StreamConfig


def dedup_window(key_cols: list[str], order_cols: list[str]):
    """Window ordering latest-first with the reference's NULL handling
    (cursor IS NULL ASC ≡ desc_nulls_last, stream_processor.py:695-702)."""
    return Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_cols]
    )


def dedup_batch(df: DataFrame, cfg: StreamConfig) -> DataFrame:
    """Keep the single latest event per primary key within a batch.

    One shuffle on the PK — the same shuffle the subsequent MERGE join needs,
    so at scale the exchange is reused (both hash-partition on url).
    """
    w = dedup_window(cfg.primary_key, cfg.order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_duplicates(df: DataFrame, cfg: StreamConfig) -> DataFrame:
    """Intra-batch exact-duplicate elimination over (pk, all order cols) —
    ≡ the reference's second dedup window (stream_processor.py:715-730),
    which drops at-least-once redeliveries of the *same* event."""
    w = Window.partitionBy(*cfg.primary_key, *cfg.order_cols).orderBy(
        F.col(cfg.order_tiebreakers[-1]).asc()
    )
    return (
        df.withColumn("_row_num", F.row_number().over(w))
        .filter(F.col("_row_num") == 1)
        .drop("_row_num")
    )
