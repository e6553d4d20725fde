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


def test_export_shards_deterministic_with_manifest(spark, tmp_path):
    """Shard export: re-running over the same corpus produces the same
    manifest and the same per-shard doc sets; shard files are id-ordered
    and carry the packing columns; manifest counts reconcile."""
    import json

    from airbyte_spark.destinations import export_shards

    docs = spark.createDataFrame(
        [(i, ("word " * (5 + i % 7)).strip()) for i in range(200)],
        "doc_id long, text string",
    )
    out1 = str(tmp_path / "shards1")
    m1 = export_shards(docs, out1, max_tokens=32, n_shards=4)
    m2 = export_shards(docs, str(tmp_path / "shards2"), max_tokens=32, n_shards=4)
    assert m1 == m2
    assert set(m1["shards"]) == {"0", "1", "2", "3"}
    assert sum(s["n_docs"] for s in m1["shards"].values()) == 200

    on_disk = json.load(open(f"{out1}/_manifest.json"))
    assert on_disk == m1

    back = spark.read.parquet(out1)
    assert back.count() == 200
    assert {"doc_id", "shard", "seq_id", "offset", "n_tokens", "text"} <= set(back.columns)
    # id-ordered within shard files (offset monotone with doc_id per shard)
    for shard in range(4):
        rows = (
            back.filter(back["shard"] == shard).orderBy("doc_id").collect()
        )
        # global tape position = seq_id*max_tokens + within-seq offset:
        # strictly increasing in id order (docs laid back-to-back)
        pos = [r["seq_id"] * 32 + r["offset"] for r in rows]
        assert pos == sorted(pos) and len(set(pos)) == len(pos)
        assert m1["shards"][str(shard)]["n_docs"] == len(rows)
        assert m1["shards"][str(shard)]["n_tokens"] == sum(r["n_tokens"] for r in rows)

    # a corrupted corpus (one doc dropped) changes that shard's checksum
    m3 = export_shards(
        docs.filter("doc_id <> 7"), str(tmp_path / "shards3"), max_tokens=32, n_shards=4
    )
    assert m3 != m1


def test_write_local_dialect_naming(spark, tmp_path):
    """Per-destination identifier rules reach the file/column names: an
    over-cap mysql column truncates with the hash suffix, accents fold for
    ascii-only dialects."""
    import os

    from airbyte_spark.destinations import read_local, write_local
    from airbyte_spark.functions.names import normalize_identifier

    long_col = "col_" + "x" * 100
    df = spark.createDataFrame([(1, "a")], f"`{long_col}` int, `Café` string")
    path = write_local(df, str(tmp_path), "My Straße Stream", fmt="json",
                       dialect="mysql")
    assert os.path.basename(path).startswith(
        normalize_identifier("My Straße Stream", dialect="mysql")
    )
    back = read_local(spark, str(tmp_path), "My Straße Stream", "json")
    # read_local uses the default normalizer for the path — same stream
    # name under mysql differs only if over-cap; here it matches
    assert set(back.columns) == {
        normalize_identifier(long_col, dialect="mysql"),
        normalize_identifier("Café", dialect="mysql"),
    }
    assert len(normalize_identifier(long_col, dialect="mysql")) == 64
