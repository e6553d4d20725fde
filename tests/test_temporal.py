"""As-of join and sessionization (operators/temporal.py)."""

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F
import pytest

from airbyte_spark.operators.temporal import asof_join, session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_backward_inclusive_and_missing(spark):
    left = spark.createDataFrame(
        [(1, "k1", _ts(10)), (2, "k1", _ts(5)), (3, "k1", _ts(2)), (4, "k2", _ts(10))],
        "event_id long, k string, t timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("k1", _ts(5), "v5"), ("k1", _ts(8), "v8"), ("k2", _ts(20), "late")],
        "k string, rt timestamp_ntz, val string",
    )
    out = {
        r["event_id"]: r["val"]
        for r in asof_join(left, right, ["k"], "t", "rt").collect()
    }
    assert out[1] == "v8"  # latest ≤ 10
    assert out[2] == "v5"  # tie at 5 is inclusive
    assert out[3] is None  # nothing at or before 2
    assert out[4] is None  # k2's only version is later


def test_asof_right_tiebreak_picks_largest(spark):
    left = spark.createDataFrame([(1, "k", _ts(9))], "id long, k string, t timestamp_ntz")
    right = spark.createDataFrame(
        [("k", _ts(9), 1, "lo"), ("k", _ts(9), 7, "hi")],
        "k string, rt timestamp_ntz, lsn long, val string",
    )
    row = asof_join(
        left, right, ["k"], "t", "rt", right_payload=["val"], right_tiebreak="lsn"
    ).first()
    assert row["val"] == "hi"


def test_asof_payload_collision_raises(spark):
    df = spark.createDataFrame([("k", _ts(0), 1)], "k string, t timestamp_ntz, v long")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df.withColumnRenamed("t", "rt"), ["k"], "t", "rt")


def test_asof_matches_pandas_merge_asof(spark):
    # deterministic pseudo-random streams, differential-tested vs pandas
    left = spark.range(200).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).cast("string").alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") * 37) % 1000)
        .cast("timestamp_ntz")
        .alias("t"),
    )
    right = spark.range(80).select(
        (F.col("id") % 7).cast("string").alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") * 91) % 1000)
        .cast("timestamp_ntz")
        .alias("rt"),
        F.col("id").alias("ver"),
    )
    # make right unique per (k, rt): keep max ver (mirrors the gated query)
    from pyspark.sql import Window

    w = Window.partitionBy("k", "rt").orderBy(F.col("ver").desc())
    right = right.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")

    got = (
        asof_join(left, right, ["k"], "t", "rt", right_payload=["ver"])
        .orderBy("event_id")
        .toPandas()
    )
    lp = left.toPandas().sort_values("t", kind="mergesort")
    rp = right.toPandas().sort_values("rt", kind="mergesort")
    want = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", by="k", direction="backward"
    ).sort_values("event_id")
    assert list(got["ver"].fillna(-1)) == list(want["ver"].fillna(-1))


def test_sessionize_gap_rule(spark):
    rows = [
        (1, 100, _ts(0)),
        (2, 100, _ts(20)),   # 20 min later → same session (gap 30 min)
        (3, 100, _ts(51)),   # 31 min later → new session
        (4, 100, _ts(81)),   # exactly 30 min → NOT a new session (strict >)
        (5, 200, _ts(0)),    # other key independent
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    out = {r["event_id"]: r["session_seq"] for r in sessionize(df, "user_id", "ts", 1800).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_session_stats_rollup(spark):
    rows = [
        (1, 100, _ts(0)),
        (2, 100, _ts(10)),
        (3, 100, _ts(120)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    out = {
        (r["user_id"], r["session_seq"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in session_stats(df, "user_id", "ts", 1800).collect()
    }
    assert out[(100, 1)] == (_ts(0), _ts(10), 2)
    assert out[(100, 2)] == (_ts(120), _ts(120), 1)
