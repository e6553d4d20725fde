"""Incremental materialized-view maintenance over a change feed.

The core CDC-downstream pattern: an aggregate table (counts / sums per
group) kept in sync with an upsert table WITHOUT recomputing it — each
refresh consumes only the row-level changes since the last refresh
(lake/changes.row_changes) and applies SIGNED deltas:

    insert, update_postimage  → +measure
    delete, update_preimage   → −measure

COUNT and SUM are self-maintainable this way (the classic incremental
view-maintenance result: they form an abelian group under +/−); MIN/MAX
are not (a deleted extremum forces a per-group rescan) and are kept out of
the measure algebra on purpose.

Scale shape (100 TB): the refresh cost is O(changes) + O(affected groups),
never O(table). Delta aggregation is map-side combinable; merging the
delta into the view is a join on the (small) group key. Visibility rules
(e.g. soft-delete tombstones) are the caller's pre-filter on the feed —
an invisible image simply contributes nothing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from airbyte_spark.lake.changes import CHANGE_TYPE_COL

_ADD_TYPES = ("insert", "update_postimage")
_SUB_TYPES = ("delete", "update_preimage")


def _measure_exprs(measures: dict[str, Column | None]) -> list[Column]:
    """measures: view column name → expression to SUM (None ⇒ COUNT(*))."""
    sign = (
        F.when(F.col(CHANGE_TYPE_COL).isin(*_ADD_TYPES), F.lit(1))
        .when(F.col(CHANGE_TYPE_COL).isin(*_SUB_TYPES), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    out = []
    for name, expr in measures.items():
        contrib = sign if expr is None else sign * expr.cast("bigint")
        out.append(F.sum(contrib).alias(name))
    return out


def build_agg(
    df: DataFrame, group_cols: list[str], measures: dict[str, Column | None]
) -> DataFrame:
    """Full (re)computation of the view — initial build and the oracle the
    incremental path must equal."""
    aggs = [
        (F.count(F.lit(1)) if expr is None else F.sum(expr.cast("bigint")))
        .cast("bigint")
        .alias(name)
        for name, expr in measures.items()
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def apply_agg_delta(
    state: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    measures: dict[str, Column | None],
) -> DataFrame:
    """state ⊕ signed-delta(changes) → next state.

    Groups whose every measure returns to zero are dropped. With a COUNT
    measure in the view (the liveness witness: count 0 ⟺ no rows), the
    result is indistinguishable from a full recompute (build_agg) over the
    new snapshot — the invariant the tests and the gated oracle pin.
    """
    delta = changes.groupBy(*group_cols).agg(*_measure_exprs(measures))
    merged = state.unionByName(delta).groupBy(*group_cols).agg(
        *[F.sum(name).cast("bigint").alias(name) for name in measures]
    )
    alive = None
    for name in measures:
        nz = F.col(name) != 0
        alive = nz if alive is None else alive | nz
    return merged.filter(alive)
