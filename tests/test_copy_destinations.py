"""Copy-via-staging sink and local CSV/JSON destinations."""

from __future__ import annotations

import os

import pytest

import pyspark.sql.functions as F

from airbyte_spark.destinations import read_local, write_local
from airbyte_spark.lake.copy_into import copy_into, stage_objects
from airbyte_spark.lake.format import LakeTable


@pytest.fixture()
def src(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _mk_table(spark, tmp_path, schema):
    return LakeTable.create(spark, str(tmp_path / "tbl"), schema)


def test_copy_into_registers_without_rewrite(spark, tmp_path, src):
    table = _mk_table(spark, tmp_path, src.schema)
    staging = str(tmp_path / "staging")
    staged = stage_objects(src, staging)
    assert staged, "staging produced no objects"
    v = copy_into(table, staging, checkpoint_key="copy-0")
    got = table.read()
    assert got.count() == src.count()
    # registered files are the very same objects (moved, not rewritten):
    # staged names reappear under the table's data dir
    reg = {os.path.basename(f.path) for f in table.files()}
    assert {os.path.basename(p) for p in staged} == reg
    # staging prefix has been drained
    assert not [p for p in os.listdir(staging) if p.endswith(".parquet")]
    # idempotent re-copy: same checkpoint key is a no-op at same version
    os.makedirs(staging, exist_ok=True)
    stage_objects(src.limit(5), staging)
    assert copy_into(table, staging, checkpoint_key="copy-0") == v
    assert table.read().count() == src.count()


def test_copy_into_schema_mismatch_aborts_and_restores(spark, tmp_path, src):
    table = _mk_table(spark, tmp_path, src.schema)
    staging = str(tmp_path / "staging")
    bad = src.drop("props")
    staged = stage_objects(bad, staging)
    with pytest.raises(ValueError, match="columns"):
        copy_into(table, staging)
    # failed copy leaves staging intact and table empty
    assert sorted(
        os.path.join(staging, n)
        for n in os.listdir(staging)
        if n.endswith(".parquet")
    ) == staged
    assert table.read().count() == 0


def test_copy_into_rejects_partitioned_table(spark, tmp_path, src):
    from airbyte_spark.lake.format import PartitionSpec

    table = LakeTable.create(
        spark,
        str(tmp_path / "tblp"),
        src.schema,
        partition_spec=PartitionSpec.bucket("event_id", 4),
    )
    staging = str(tmp_path / "staging")
    stage_objects(src.limit(10), staging)
    with pytest.raises(ValueError, match="unpartitioned"):
        copy_into(table, staging)


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet"])
def test_local_destination_roundtrip(spark, tmp_path, src, fmt):
    dest = str(tmp_path / "dest")
    # awkward identifiers must normalize in the written artifact
    df = src.select(
        F.col("event_id").alias("Event Id"),
        F.col("event_type").alias("event-type!"),
        "value",
    )
    path = write_local(df, dest, "My Stream", fmt=fmt)
    assert os.path.basename(path).startswith("my_stream")
    back = read_local(spark, dest, "My Stream", fmt)
    # reference semantics: each invalid char → '_', so "event-type!" keeps
    # its trailing underscore (destination_name_transformer.py:19-110)
    assert set(back.columns) == {"event_id", "event_type_", "value"}
    assert back.count() == src.count()
    assert (
        back.agg(F.sum("event_id")).first()[0]
        == src.agg(F.sum("event_id")).first()[0]
    )


def test_local_destination_append_and_overwrite(spark, tmp_path, src):
    dest = str(tmp_path / "dest")
    write_local(src.limit(10), dest, "s", fmt="json", mode="overwrite")
    write_local(src.limit(7), dest, "s", fmt="json", mode="append")
    assert read_local(spark, dest, "s", "json").count() == 17
    write_local(src.limit(3), dest, "s", fmt="json", mode="overwrite")
    assert read_local(spark, dest, "s", "json").count() == 3
