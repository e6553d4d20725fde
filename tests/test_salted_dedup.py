"""Salted two-phase dedup must agree exactly with the window dedup,
including hot-key batches, null cursors, and tombstones."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql.types import StructField, StructType

from airbyte_spark.operators.dedup import dedup_batch, presalted_dedup
from airbyte_spark.protocol import StreamConfig
from airbyte_spark.schema import CHANGE_SCHEMA

NULLABLE = StructType([StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA.fields])


def gen(seed, n_urls, n_events, hot_frac=0.5):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for lsn in range(n_events):
        u = "hot" if rng.random() < hot_frac else f"u{rng.randrange(n_urls)}"
        ts = None if rng.random() < 0.05 else base + dt.timedelta(minutes=rng.randrange(30))
        deleted = ts if ts is not None and rng.random() < 0.2 else None
        rows.append((u, ts, None, f"t{lsn}", "en", ts, deleted, lsn, ts, 0))
    return rows


def key_of(r):
    return (r["url"], r["warc_ts"], r["_ab_cdc_lsn"], r["text"], r["_ab_cdc_deleted_at"])


@pytest.mark.parametrize("seed", [0, 7])
def test_salted_equals_window_dedup(spark, seed):
    cfg = StreamConfig(name="pages", schema=NULLABLE)
    df = spark.createDataFrame(gen(seed, 10, 400), NULLABLE).repartition(8)
    a = sorted(key_of(r) for r in dedup_batch(df, cfg).collect())
    b = sorted(key_of(r) for r in presalted_dedup(df, cfg, salt_buckets=4).collect())
    assert a == b and len(a) > 0


def test_salted_dedup_in_merge_path(spark, tmp_path):
    """Pre-salting then merging equals merging the raw batch."""
    from airbyte_spark.streaming.pipeline import CdcPipeline

    cfg = StreamConfig(name="pages", schema=NULLABLE)
    rows = gen(3, 8, 300)
    df = spark.createDataFrame(rows, NULLABLE)

    raw = CdcPipeline.create_target(spark, str(tmp_path / "raw"), n_buckets=4)
    raw.apply_batch(df, "c0")
    salted = CdcPipeline.create_target(spark, str(tmp_path / "salted"), n_buckets=4)
    salted.apply_batch(presalted_dedup(df, cfg, 4), "c0")

    a = sorted(key_of(r) for r in raw.raw_state().collect())
    b = sorted(key_of(r) for r in salted.raw_state().collect())
    assert a == b
