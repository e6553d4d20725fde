"""Partial-column update merge: per-COLUMN last-writer-wins.

Row-granularity CDC (the engine's merge path) assumes every event carries
a full row image. Document stores and wide-column sources emit PATCH
events instead — only the fields that changed are present (MongoDB
update_description, DynamoDB streams' UpdatedAttributes; the reference
ingests Mongo through the same Debezium envelope, where the after-image
of an update holds just the set fields unless full-document mode is on).
Collapsing a patch stream with row-level LWW silently nulls out every
field the winning patch didn't mention.

`apply_patches` resolves per-column LWW in ONE aggregate: for each key
and each patchable column, take the column's value from the latest event
(by log position) where the column is PRESENT; absent is encoded as NULL
(so this operator is for sources whose patches never carry explicit
nulls — field removal needs a sentinel, documented limitation). A key
whose latest event overall is a tombstone is dropped.

Scale shape (100 TB): no window, no join — a single groupBy(key) with
max_by per column, which combines map-side: a hot key's millions of
patches collapse to one partial row per map task before the shuffle, so
patch-heavy skew never concentrates on one reducer the way a window
sort would. This is strictly cheaper than the row-LWW window and is the
right primitive for patch streams at any fan-in.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def apply_patches(
    events: DataFrame,
    patch_cols: list[str],
    key_cols: list[str] = ("url",),
    lsn_col: str = "_ab_cdc_lsn",
    deleted_col: str = "_ab_cdc_deleted_at",
) -> DataFrame:
    """Collapse a patch stream to final rows: per column, the value from
    the latest event carrying it; tombstoned keys (latest event overall is
    a delete) are dropped. Returns key cols + patch cols + the winning
    position per column is internal (not emitted).

    max_by's ordering argument is NULL for events where the column is
    absent, and aggregate ordering ignores NULL order values — that is
    what scopes each column's LWW to the events that actually set it."""
    key_cols = list(key_cols)
    aggs = [
        F.max_by(
            F.col(c), F.when(F.col(c).isNotNull(), F.col(lsn_col))
        ).alias(c)
        for c in patch_cols
    ]
    aggs.append(
        F.max_by(F.col(deleted_col).isNotNull(), F.col(lsn_col)).alias("_is_del")
    )
    aggs.append(F.max(F.col(lsn_col)).alias(lsn_col))
    return (
        events.groupBy(*key_cols)
        .agg(*aggs)
        .filter(~F.col("_is_del"))
        .drop("_is_del")
    )
