"""Sketches: HLL segment union, Misra-Gries heavy hitters, salt map."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.operators.sketches import (
    _misra_gries_partition,
    heavy_hitters,
    segment_key_sketches,
    skew_salt_map,
    union_distinct_estimate,
)


def _skewed(spark, n_hot=5000, n_cold=2000):
    """One very hot key + many singletons, spread over several partitions."""
    hot = spark.range(n_hot).select(F.lit("hot.example.com").alias("k"))
    cold = spark.range(n_cold).select(
        F.concat(F.lit("cold-"), F.col("id").cast("string")).alias("k")
    )
    return hot.unionAll(cold).repartition(8)


def test_misra_gries_guarantee():
    import pandas as pd

    # 60% 'a', rest unique: with m=4 counters 'a' must survive
    stream = ["a"] * 60 + [f"u{i}" for i in range(40)]
    counters = _misra_gries_partition(iter([pd.Series(stream)]), m=4)
    assert "a" in counters
    assert len(counters) <= 4


def test_heavy_hitters_exact_on_skewed(spark):
    df = _skewed(spark)
    got = {r["key"]: r["n"] for r in heavy_hitters(df, F.col("k"), k=10).collect()}
    # only the hot key exceeds 7000/10 rows
    assert got == {"hot.example.com": 5000}


def test_heavy_hitters_is_superset_pruned_not_lossy(spark):
    # uniform keys, none above threshold -> empty output (no false positives)
    df = spark.range(1000).select((F.col("id") % 100).cast("string").alias("k"))
    assert heavy_hitters(df, F.col("k"), k=200).count() == 100  # all > n/200
    assert heavy_hitters(df, F.col("k"), k=50).count() == 0  # none > n/50


def test_hll_union_matches_whole_stream_estimate(spark, sf_dir):
    from airbyte_spark.sources.changelog import read_changelog

    log = read_changelog(spark, sf_dir, batch_span=100)
    seg = segment_key_sketches(log, "url")
    assert seg.count() == 10  # one sketch per segment
    est = union_distinct_estimate(seg).collect()[0]
    whole = log.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("url").cast("string"), F.lit(14))
        ).alias("e")
    ).collect()[0]["e"]
    # union of per-segment sketches == sketch of the union (mergeability)
    assert est["n_distinct_est"] == whole
    exact = log.select("url").distinct().count()
    assert abs(est["n_distinct_est"] - exact) <= max(1, 0.01 * exact)
    assert est["n_rows"] == log.count()


def test_skew_salt_map(spark):
    df = _skewed(spark)
    plan = {r["key"]: r["salt"] for r in
            skew_salt_map(df, F.col("k"), k=10, rows_per_task=1000).collect()}
    assert plan == {"hot.example.com": 5}  # ceil(5000/1000)
