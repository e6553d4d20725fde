"""Stats-based read-path file pruning: manifest-only planning must skip
non-overlapping files while read_where stays exactly equal to a full
scan + filter (pruning is an optimization, never a correctness gate)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.format import LakeTable, PartitionSpec


@pytest.fixture()
def ranged_table(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, PartitionSpec())
    for i in range(4):
        t.append(
            df.filter(F.col("k").between(i * 250, i * 250 + 249)),
            checkpoint_key=f"c{i}",
            stat_cols=["k"],
        )
    return t, df


def test_prune_skips_disjoint_files(ranged_table):
    t, _ = ranged_table
    assert len(t.files()) == 4
    kept = t.prune({"k": (300, 499)})
    assert len(kept) == 1  # only the 250-499 file overlaps
    assert kept[0].stats["k"]["min"] == 250


def test_read_where_equals_full_filter(ranged_table):
    t, df = ranged_table
    got = sorted(r["k"] for r in t.read_where({"k": (100, 620)}).collect())
    want = sorted(r["k"] for r in df.filter(F.col("k").between(100, 620)).collect())
    assert got == want


def test_open_ended_ranges(ranged_table):
    t, _ = ranged_table
    assert len(t.prune({"k": (750, None)})) == 1
    assert len(t.prune({"k": (None, 249)})) == 1
    assert t.read_where({"k": (900, None)}).count() == 100


def test_missing_stats_are_conservative(spark, tmp_path):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, PartitionSpec())
    t.append(df, checkpoint_key="nostats")  # stat_cols omitted
    # no stats → files can never be pruned, and results stay exact
    assert len(t.prune({"k": (1000, 2000)})) == len(t.files())
    assert t.read_where({"k": (1000, 2000)}).count() == 0


def test_type_mismatch_keeps_file(ranged_table):
    t, _ = ranged_table
    # int stats vs string bounds cannot be compared — file must survive
    assert len(t.prune({"k": ("a", "b")})) == 4


def test_multi_column_conjunction(spark, tmp_path):
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (399 - F.col("id")).alias("r")
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, PartitionSpec())
    for i in range(2):
        t.append(
            df.filter(F.col("k").between(i * 200, i * 200 + 199)),
            checkpoint_key=f"c{i}",
            stat_cols=["k", "r"],
        )
    # k-range keeps file 0 only; r-range keeps file 1 only → conjunction empty
    assert len(t.prune({"k": (0, 150), "r": (0, 150)})) == 0
    assert t.read_where({"k": (0, 150), "r": (0, 150)}).count() == 0


def test_files_df_metadata_table(ranged_table, spark):
    t, _ = ranged_table
    fdf = t.files_df()
    assert fdf.count() == len(t.files())
    import pyspark.sql.functions as FF

    total = fdf.agg(FF.sum("rows")).first()[0]
    assert total == 1000
    # stats are queryable with plain SQL over the JSON payload
    mins = sorted(
        int(r[0])
        for r in fdf.select(
            FF.get_json_object("stats", "$.k.min").alias("m")
        ).collect()
    )
    assert mins == [0, 250, 500, 750]


def test_pruned_read_property(spark, tmp_path):
    """Property: for ANY commit layout and ANY range, read_where ≡ full
    scan + filter (pruning can only skip provably-disjoint files)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    df = spark.range(0, 200).select(F.col("id").alias("k"))
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, PartitionSpec())
    # uneven, overlapping commits — including one with no stats
    t.append(df.filter(F.col("k") < 80), checkpoint_key="a", stat_cols=["k"])
    t.append(df.filter(F.col("k").between(60, 159)), checkpoint_key="b", stat_cols=["k"])
    t.append(df.filter(F.col("k") >= 160), checkpoint_key="c")
    full = sorted(r["k"] for r in t.read().collect())

    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        lo=st.one_of(st.none(), st.integers(-50, 250)),
        hi=st.one_of(st.none(), st.integers(-50, 250)),
    )
    def check(lo, hi):
        got = sorted(r["k"] for r in t.read_where({"k": (lo, hi)}).collect())
        want = [
            k
            for k in full
            if (lo is None or k >= lo) and (hi is None or k <= hi)
        ]
        assert got == want

    check()
