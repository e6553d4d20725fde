"""The reference's 3-phase golden scenario re-expressed for this engine
(base-normalization test_normalization.py:84-137):

  phase 1 — first sync (full snapshot as the initial change batch)
  phase 2 — incremental sync (new / updated / deleted records)
  phase 3 — schema-change sync (added column + widened type) applied
            incrementally without rewriting phase-1/2 files

Assertions mirror the reference's dbt data tests: row counts per phase,
PK uniqueness of the final table, and final values against a hand-built
expected state (DestinationAcceptanceTest-style 'latest emitted per PK')."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from airbyte_spark.schema import CHANGE_SCHEMA
from airbyte_spark.streaming.pipeline import CdcPipeline

T = [dt.datetime(2024, 1, 1 + i) for i in range(10)]


def ev(url, ts, lsn, ckpt, deleted=None, text=None, lang="en"):
    return (url, ts, None, text, lang, ts, deleted, lsn, ts, ckpt)


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    p = CdcPipeline.create_target(
        spark, str(tmp_path_factory.mktemp("threephase") / "pages"), n_buckets=4
    )
    # phase 1: initial snapshot — 4 pages
    b1 = [ev(f"u{i}", T[0], i, 0, text=f"v0-{i}") for i in range(4)]
    p.apply_batch(spark.createDataFrame(b1, CHANGE_SCHEMA), "ckpt-0")

    # phase 2: incremental — update u1, delete u2, insert u4
    b2 = [
        ev("u1", T[1], 10, 1, text="v1-1"),
        ev("u2", T[1], 11, 1, deleted=T[1]),
        ev("u4", T[1], 12, 1, text="v1-4"),
    ]
    p.apply_batch(spark.createDataFrame(b2, CHANGE_SCHEMA), "ckpt-1")
    return p


def test_phase2_row_counts(pipe):
    # ≡ test_check_row_counts fixtures: 4 initial, -1 delete, +1 insert
    final = pipe.final_state()
    assert final.count() == 4
    assert pipe.raw_state().count() == 5  # includes the tombstone


def test_phase2_values(pipe):
    got = {r["url"]: (r["text"], r["_ab_cdc_lsn"]) for r in pipe.final_state().collect()}
    assert got == {
        "u0": ("v0-0", 0),
        "u1": ("v1-1", 10),
        "u3": ("v0-3", 3),
        "u4": ("v1-4", 12),
    }


def test_phase3_schema_change(pipe, spark):
    """Phase 3: the stream adds `score` (new column) and the engine widens
    a long payload column to double — applied incrementally."""
    # widened-type column: first introduce `rank_l` as long in one batch,
    # then deliver it as double in the next (≡ USD number→integer re-cast
    # exercised by the golden fixture catalog_schema_change.json)
    evolved_schema = StructType(
        [*CHANGE_SCHEMA.fields, StructField("rank_l", LongType(), True)]
    )
    b3a = [ev("u5", T[2], 20, 2, text="v2-5") + (7,)]
    pipe.apply_batch(spark.createDataFrame(b3a, evolved_schema), "ckpt-2")

    evolved2 = StructType(
        [
            *CHANGE_SCHEMA.fields,
            StructField("rank_l", DoubleType(), True),
            StructField("score", StringType(), True),
        ]
    )
    b3b = [ev("u0", T[3], 21, 3, text="v3-0") + (2.5, "high")]
    pipe.apply_batch(spark.createDataFrame(b3b, evolved2), "ckpt-3")

    final = pipe.final_state()
    assert final.schema["rank_l"].dataType == DoubleType()
    got = {r["url"]: (r["text"], r["rank_l"], r["score"]) for r in final.collect()}
    assert got == {
        "u0": ("v3-0", 2.5, "high"),  # updated with new columns
        "u1": ("v1-1", None, None),  # old rows: NULL-filled
        "u3": ("v0-3", None, None),
        "u4": ("v1-4", None, None),
        "u5": ("v2-5", 7.0, None),  # long 7 read back as widened double
    }


def test_final_pk_unique(pipe):
    # ≡ dbt schema test: unique _airbyte_unique_key on the final table
    final = pipe.final_state()
    assert final.count() == final.select("url").distinct().count()


def test_metrics_lineage_per_checkpoint(pipe):
    m = {r["checkpoint_key"]: r for r in pipe.metrics().collect()}
    assert set(m) == {"ckpt-0", "ckpt-1", "ckpt-2", "ckpt-3"}
    assert m["ckpt-0"]["rows_in"] == 4
    assert m["ckpt-1"]["rows_in"] == 3
