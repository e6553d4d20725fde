"""Temporal operators Spark lacks as built-ins: as-of join, sessionization.

Both are expressed as compositions of existing DataFrame ops (the brief's
preferred path for custom operators) — no Pandas UDF, no mapPartitions:

  - as-of join: ONE shuffle, no join. Instead of the naive (left ⋈ right
    on key + time-range) + per-left-row argmax — two shuffles and a
    potentially quadratic range join — both sides are UNIONED, hash-
    clustered by key and sorted by (time, side), and each left row picks
    up the most recent right payload with last(ignorenulls) over the
    running window. This is the plan a time-series engine (kdb aj,
    QuestDB/DuckDB ASOF JOIN) executes, restated in Catalyst terms; cost
    is sort-shuffle of |L|+|R|, never |L|×|R|.
  - sessionization: the gap rule (new session when the key is silent
    longer than `gap`) as lag + running sum over one key-clustered window
    — the batch restatement of Structured Streaming's session_window.

Skew note (100 TB): both windows partition on the join/session key alone,
so a pathologically hot key serializes within its partition. For the CDC
url keyspace this is the bucketing assumption everywhere else in the
engine; for genuinely hot keys, pre-split with salting at the source
(operators/dedup.presalted_dedup shows the pattern) — the as-of window
cannot be salted blindly because a left row's answer may live in another
salt bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    LARGEST right_time ≤ left_time for the same key columns — inclusive on
    ties, matching DuckDB/QuestDB `ASOF JOIN` and pandas
    `merge_asof(direction="backward")`. Left rows with no earlier right
    row keep NULL payload (left-join semantics); output is one row per
    left row with `right_payload` columns appended.

    Right rows tying on (key, right_time) are resolved by `right_tiebreak`
    (largest wins); without it the right side must be unique per
    (key, right_time) or the winner among ties is undefined.
    """
    payload = right_payload or [
        c for c in right.columns if c not in on and c != right_time
    ]
    overlap = [c for c in payload if c in left.columns]
    if overlap:
        raise ValueError(f"right payload columns collide with left: {overlap}")

    lpay_t = left.select(F.struct(*left.columns).alias("_l")).schema["_l"].dataType
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("_t"),
        # side tag: right=0 sorts BEFORE left=1 at equal times → ties inclusive
        F.lit(0).alias("_side"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias("_tb"),
        F.struct(*[F.col(c) for c in payload]).alias("_pay"),
        F.lit(None).cast(lpay_t).alias("_l"),
    )
    rpay_t = r.schema["_pay"].dataType
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(0).alias("_tb"),
        F.lit(None).cast(rpay_t).alias("_pay"),
        F.struct(*left.columns).alias("_l"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(l)
        .withColumn("_asof", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(c) for c in payload],
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based sessions per key: a row starts a new session when
    it is the key's first event or arrives more than `gap_seconds` after
    the previous event. Adds `session_seq` (1-based per key) — equivalent
    to Structured Streaming's session_window grouping, produced in batch
    with ONE shuffle (lag + running sum over the key window)."""
    order = [F.col(ts).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    # second-BOUNDARY difference (trunc-then-diff), the SQL date_diff
    # convention — sub-second inputs must not shift the gap rule between
    # engines (TIMESTAMP_NTZ also has no direct long cast in Spark 4)
    tsec = F.date_trunc("second", F.col(ts))
    prev = F.lag(tsec).over(w)
    is_new = (
        prev.isNull()
        | (F.timestamp_diff("SECOND", prev, tsec) > F.lit(gap_seconds))
    ).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(is_new).over(run))


def session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session rollup over sessionize(): start/end timestamps and event
    count — the continuous-aggregate shape a session store materializes.
    The groupBy rides the same key clustering the window just produced, so
    no second wide exchange of the full data is needed."""
    s = sessionize(df, key, ts, gap_seconds, order_tiebreak)
    return s.groupBy(key, "session_seq").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
