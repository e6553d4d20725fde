"""Composite primary keys + merge robustness regressions.

The reference treats composite PKs as first-class: source_defined_primary_key
is a list of key paths (airbyte_protocol.yaml:150) and the destination
acceptance contract builds expected state per *composite* PK
(DestinationAcceptanceTest.java:612-637). These tests drive merge_upsert
end-to-end with a two-column key, and pin two regressions: a winning event
with a NULL last-tiebreaker must survive the late-materialization semi-join,
and an unbucketed table must not funnel the merge window through one task.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from airbyte_spark.lake.format import LakeTable, PartitionSpec
from airbyte_spark.lake.merge import merge_upsert, resolve_merge
from airbyte_spark.protocol import StreamConfig

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 2)
T2 = dt.datetime(2024, 1, 3)

COMPOSITE_TARGET = StructType(
    [
        StructField("url", StringType(), False),
        StructField("section", LongType(), False),
        StructField("warc_ts", TimestampNTZType(), True),
        StructField("val", StringType(), True),
        StructField("_ab_cdc_lsn", LongType(), True),
        StructField("_ab_cdc_deleted_at", TimestampNTZType(), True),
    ]
)


@pytest.fixture(scope="module")
def ccfg():
    return StreamConfig(
        name="sections", schema=COMPOSITE_TARGET, primary_key=["url", "section"]
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, COMPOSITE_TARGET)


def _final(table):
    return {
        (r["url"], r["section"]): (r["warc_ts"], r["val"], r["_ab_cdc_lsn"])
        for r in table.read().collect()
        if r["_ab_cdc_deleted_at"] is None
    }


def test_composite_pk_merge_end_to_end(spark, tmp_path, ccfg):
    """Two batches over a (url, section) key: per-subkey LWW independence,
    tombstone on one subkey leaves sibling subkeys alive."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), COMPOSITE_TARGET, PartitionSpec.bucket("url", 4)
    )
    b1 = _batch(
        spark,
        [
            ("u1", 0, T0, "a0", 1, None),
            ("u1", 1, T0, "a1", 2, None),
            ("u2", 0, T0, "b0", 3, None),
        ],
    )
    merge_upsert(t, b1, ccfg, checkpoint_key="c1")
    b2 = _batch(
        spark,
        [
            ("u1", 0, T1, "a0v2", 4, None),  # update one subkey
            ("u1", 1, T1, None, 5, T1),      # delete the sibling subkey
            ("u2", 1, T1, "b1", 6, None),    # new subkey under existing url
            ("u2", 0, T0, "late", 0, None),  # cursor tie, lower lsn → loses
        ],
    )
    merge_upsert(t, b2, ccfg, checkpoint_key="c2")
    assert _final(t) == {
        ("u1", 0): (T1, "a0v2", 4),
        ("u2", 0): (T0, "b0", 3),
        ("u2", 1): (T1, "b1", 6),
    }
    # replayed composite batch is a no-op (idempotence by checkpoint key)
    stats = merge_upsert(t, b2, ccfg, checkpoint_key="c2")
    assert stats.skipped


def test_composite_pk_tie_breaks_within_subkey_only(spark, tmp_path, ccfg):
    """Events on different subkeys never dedup against each other even at
    identical cursors/lsns-adjacent values."""
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), COMPOSITE_TARGET, PartitionSpec.bucket("url", 2)
    )
    b = _batch(
        spark,
        [("u1", s, T0, f"v{s}", 10 + s, None) for s in range(5)],
    )
    merge_upsert(t, b, ccfg, checkpoint_key="c1")
    assert len(_final(t)) == 5


def test_null_last_tiebreaker_winner_survives(spark, tmp_path):
    """A key whose winning event carries a NULL _ab_cdc_lsn must not be
    dropped by the winner semi-join (eqNullSafe regression)."""
    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampNTZType(), True),
            StructField("val", StringType(), True),
            StructField("_ab_cdc_lsn", LongType(), True),
            StructField("_ab_cdc_deleted_at", TimestampNTZType(), True),
        ]
    )
    cfg = StreamConfig(name="p", schema=schema, primary_key=["url"])
    t = LakeTable.create(spark, str(tmp_path / "t3"), schema, PartitionSpec.bucket("url", 2))
    b = spark.createDataFrame(
        [
            ("nolsn", T1, "only-event", None, None),   # sole event, NULL lsn
            ("mix", T0, "null-lsn", None, None),       # NULL lsn loses to...
            ("mix", T1, "real-lsn", 7, None),          # ...newer cursor w/ lsn
        ],
        schema,
    )
    merge_upsert(t, b, cfg, checkpoint_key="c1")
    got = {r["url"]: (r["val"], r["_ab_cdc_lsn"]) for r in t.read().collect()}
    assert got == {"nolsn": ("only-event", None), "mix": ("real-lsn", 7)}


def test_unbucketed_window_parallelism(spark):
    """With no bucket spec the merge window must spread across key-hash salt
    partitions, not collapse to one global sort task (ADVICE regression)."""
    cfg = StreamConfig(
        name="p",
        schema=COMPOSITE_TARGET,
        primary_key=["url"],
    )
    rows = [(f"u{i}", T0, None, f"v{i}", "en", T0, None, i, T0, 0) for i in range(200)]
    from airbyte_spark.schema import CHANGE_SCHEMA

    batch = spark.createDataFrame(rows, CHANGE_SCHEMA)
    existing = spark.createDataFrame([], CHANGE_SCHEMA)
    out = resolve_merge(
        existing, batch, cfg, CHANGE_SCHEMA.fieldNames(), bucket_expr=None, sub_split=8
    )
    # AQE legitimately coalesces this tiny shuffle to one partition; turn
    # coalescing off to observe the physical spread the salt provides.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        per_part = out.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert sum(per_part) == 200
    assert sum(1 for n in per_part if n > 0) > 1  # work spread beyond one task
