"""ADD COLUMN with initial defaults (≡ Iceberg v3 initial-default).

The default is keyed on the new column's FIELD ID: file generations whose
schema predates the id fill the default at read (zero rewrites — the only
affordable constant-backfill at 100 TB); generations written after the add
read their stored bytes, so an explicit NULL stays NULL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.format import LakeTable, PartitionSpec


def _src(spark, sf_dir, n=200):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "event_type")
        .limit(n)
    )


def test_old_files_read_default_new_files_read_bytes(spark, sf_dir, tmp_path):
    src = _src(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t"), src.schema, PartitionSpec())
    t.append(src, checkpoint_key="old")
    files_before = {e.path for e in t.files()}
    t.add_column("source", "string", default="backfill-a")
    assert {e.path for e in t.files()} == files_before  # metadata only
    # every pre-add row reads the default
    assert t.read().filter(F.col("source") == "backfill-a").count() == src.count()
    # post-add writes carry their own values — explicit NULL stays NULL
    t.append(
        src.limit(10).withColumn("source", F.lit("live")), checkpoint_key="new"
    )
    t.append(
        src.limit(5).withColumn("source", F.lit(None).cast("string")),
        checkpoint_key="null",
    )
    counts = {
        r["source"]: r["n"]
        for r in t.read().groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"backfill-a": src.count(), "live": 10, None: 5}


def test_typed_default_casts(spark, sf_dir, tmp_path):
    src = _src(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t2"), src.schema, PartitionSpec())
    t.append(src)
    t.add_column("priority", "bigint", default=7)
    t.add_column("ingested_at", "timestamp_ntz", default="2026-01-01 00:00:00")
    row = t.read().select("priority", "ingested_at").first()
    assert row["priority"] == 7
    assert str(row["ingested_at"]) == "2026-01-01 00:00:00"
    df = t.read()
    assert dict(df.dtypes)["priority"] == "bigint"
    assert dict(df.dtypes)["ingested_at"] == "timestamp_ntz"


def test_rename_keeps_default_redadd_does_not_resurrect(spark, sf_dir, tmp_path):
    src = _src(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t3"), src.schema, PartitionSpec())
    t.append(src)
    t.add_column("tier", "string", default="bronze")
    t.rename_column("tier", "grade")
    # default follows the field id through the rename
    assert t.read().filter(F.col("grade") == "bronze").count() == src.count()
    t.drop_column("grade")
    t.add_column("tier", "string")  # fresh id, no default
    assert t.read().filter(F.col("tier").isNull()).count() == src.count()


def test_compaction_materializes_default(spark, sf_dir, tmp_path):
    src = _src(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t4"), src.schema, PartitionSpec())
    t.append(src.limit(50))
    t.append(src.filter("event_id % 7 = 0"))
    t.add_column("source", "string", default="bulk")
    n_default = t.read().filter("source = 'bulk'").count()
    t.compact(target_file_bytes=1 << 30)
    # rewritten files physically carry the value; read result unchanged
    assert t.read().filter("source = 'bulk'").count() == n_default


def test_time_travel_and_rollback(spark, sf_dir, tmp_path):
    src = _src(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t5"), src.schema, PartitionSpec())
    t.append(src)
    v_before = t.current_version()
    t.add_column("source", "string", default="x")
    assert "source" not in t.read(v_before).columns  # pre-add snapshot
    t.rollback(v_before)
    assert "source" not in t.read().columns
    t.rollback(v_before + 1)  # roll forward: default is back
    assert t.read().filter("source = 'x'").count() == src.count()


def test_duplicate_and_bad_default_rejected(spark, sf_dir, tmp_path):
    src = _src(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t6"), src.schema, PartitionSpec())
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("event_id", "bigint")
    with pytest.raises(ValueError, match="JSON-storable"):
        t.add_column("blob", "string", default=object())
