"""Per-partition lineage: each commit's rows/bytes/files split by the
partition tuple it landed in, derived from the manifest chain (the
north-star's "per-partition lineage and row-count/byte metrics persisted
alongside state"; ≡ the reference's per-stream sync stats,
AirbyteStateStats in airbyte_protocol.yaml, aggregated per partition).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from airbyte_spark.lake.format import LakeTable, PartitionSpec


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )


def test_lineage_per_partition_sums_to_appended(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), src.schema, PartitionSpec.bucket("user_id", 4)
    )
    n0 = src.filter(F.col("event_id") % 2 == 0).count()
    n1 = src.count() - n0
    t.append(src.filter(F.col("event_id") % 2 == 0), checkpoint_key="ck-0")
    t.append(src.filter(F.col("event_id") % 2 == 1), checkpoint_key="ck-1")

    lin = t.lineage_df().collect()
    by_version: dict[int, list] = {}
    for r in lin:
        by_version.setdefault(r["version"], []).append(r)

    # the create commit (version 1, zero files) also appears; the two
    # appends are the last two versions
    v_first, v_second = sorted(by_version)[-2:]
    assert sum(r["rows_written"] for r in by_version[v_first]) == n0
    assert sum(r["rows_written"] for r in by_version[v_second]) == n1
    # bucketed layout → the commit is split across >1 partition tuple
    assert len(by_version[v_first]) > 1
    assert {r["checkpoint_key"] for r in by_version[v_first]} == {"ck-0"}
    appended = by_version[v_first] + by_version[v_second]
    assert all(r["bytes_written"] > 0 and r["files_added"] >= 1 for r in appended)
    # partition tuples are the spec's bucket column
    assert all("bucket" in r["partition"] for r in appended)


def test_lineage_tracks_removals_and_empty_commits(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir).limit(100)
    t = LakeTable.create(spark, str(tmp_path / "t"), src.schema, PartitionSpec())
    t.append(src, checkpoint_key="ck-0")
    n_files = len(t.files())
    t.truncate()
    lin = {r["version"]: r for r in t.lineage_df().collect()}
    trunc = lin[max(lin)]
    assert trunc["operation"] == "truncate"
    assert trunc["files_added"] == 0 and trunc["rows_written"] == 0
    assert trunc["files_removed"] == n_files


def test_lineage_empty_table(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        StructType([StructField("k", LongType())]),
        PartitionSpec(),
    )
    assert t.lineage_df().count() <= 1  # at most the create/initial version
