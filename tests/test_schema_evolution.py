"""Schema-evolution unit + engine tests — the reference's catalog-diff rules
(golden scenario test_normalization.py:126-137: add column, widen type,
dropped column ignored) as StructType diffs and through the lake table."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from airbyte_spark.lake.format import LakeTable, PartitionSpec
from airbyte_spark.schema import (
    AddColumn,
    IncompatibleChange,
    PromoteType,
    diff_schemas,
    evolve,
    json_type_to_spark,
)


def S(*fields):
    return StructType([StructField(n, t, True) for n, t in fields])


def test_diff_add_column():
    old = S(("id", LongType()))
    new = S(("id", LongType()), ("new_column", StringType()))
    assert diff_schemas(old, new) == [AddColumn("new_column", StringType())]


def test_diff_widen_int_to_double():
    """≡ golden scenario: `id` integer→number."""
    old = S(("id", LongType()))
    new = S(("id", DoubleType()))
    assert diff_schemas(old, new) == [PromoteType("id", LongType(), DoubleType())]


def test_diff_widen_chain_bool_to_string():
    for old_t, new_t in [
        (BooleanType(), LongType()),
        (BooleanType(), StringType()),
        (LongType(), DoubleType()),
        (DoubleType(), StringType()),
    ]:
        assert diff_schemas(S(("x", old_t)), S(("x", new_t))) == [
            PromoteType("x", old_t, new_t)
        ]


def test_diff_narrowing_is_incompatible():
    old = S(("x", StringType()))
    new = S(("x", LongType()))
    (a,) = diff_schemas(old, new)
    assert isinstance(a, IncompatibleChange)
    with pytest.raises(ValueError):
        evolve(old, new)


def test_diff_dropped_column_ignored():
    """Reference keeps removed columns (history preserved, new rows NULL)."""
    old = S(("id", LongType()), ("gone", StringType()))
    new = S(("id", LongType()))
    assert diff_schemas(old, new) == []
    assert evolve(old, new) == old


def test_json_type_mapping():
    assert json_type_to_spark("integer") == LongType()
    assert json_type_to_spark("number") == DoubleType()
    assert json_type_to_spark("string", "date-time") == TimestampNTZType()
    assert json_type_to_spark("boolean") == BooleanType()


def test_lake_table_evolution_roundtrip(spark, tmp_path):
    """Write gen-0 rows, evolve (add column + widen), write gen-1 rows; a
    read must align both file generations to the current schema without
    rewriting gen-0 files."""
    old = S(("k", StringType()), ("v", LongType()))
    t = LakeTable.create(spark, str(tmp_path / "t"), old, PartitionSpec())
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], old))
    files_gen0 = {f.path for f in t.files()}

    new = S(("k", StringType()), ("v", DoubleType()), ("w", StringType()))
    t.evolve_schema(new)
    t.append(spark.createDataFrame([("c", 3.5, "x")], new))

    got = {r["k"]: (r["v"], r["w"]) for r in t.read().collect()}
    assert got == {"a": (1.0, None), "b": (2.0, None), "c": (3.5, "x")}
    # gen-0 files untouched
    assert files_gen0 <= {f.path for f in t.files()}
    assert t.schema()["v"].dataType == DoubleType()


def test_evolution_through_merge(spark, tmp_path):
    """A later change batch carrying a new payload column evolves the target
    mid-stream; earlier rows read as NULL (≡ incremental catalog-change run)."""
    import pyspark.sql.functions as F

    from airbyte_spark.protocol import StreamConfig
    from airbyte_spark.schema import CHANGE_SCHEMA
    from airbyte_spark.streaming.pipeline import CdcPipeline

    T0, T1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    pipe = CdcPipeline.create_target(spark, str(tmp_path / "pages"), n_buckets=4)
    b0 = spark.createDataFrame(
        [("u1", T0, None, "t1", "en", T0, None, 1, T0, 0)], CHANGE_SCHEMA
    )
    pipe.apply_batch(b0, "ckpt-0")

    b1 = spark.createDataFrame(
        [("u2", T1, None, "t2", "de", T1, None, 2, T1, 1)], CHANGE_SCHEMA
    ).withColumn("score", F.lit(0.9))
    pipe.apply_batch(b1, "ckpt-1")

    got = {r["url"]: r["score"] for r in pipe.final_state().collect()}
    assert got == {"u1": None, "u2": 0.9}


def test_catalog_diff_query(spark):
    """The gated sync_catalog_diff query emits the typed change actions for
    the documents stream's evolved schema (add + widen; drop ignored)."""
    import __spark_entry__ as E

    rows = {
        r["field"]: (r["change"], r["old_type"], r["new_type"])
        for r in E.queries()["sync_catalog_diff"](spark, "/root/testdata/sf0.001").collect()
    }
    assert rows == {
        "n_chars": ("promote_type", "bigint", "double"),
        "quality": ("add_column", None, "double"),
    }
