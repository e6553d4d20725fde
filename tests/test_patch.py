"""Partial-column update merge (operators/patch.py): per-column LWW over
patch events, tombstone handling, and the row-LWW failure mode it fixes."""

from __future__ import annotations

import pytest

from airbyte_spark.operators.patch import apply_patches

SCHEMA = "url string, _ab_cdc_lsn long, _ab_cdc_deleted_at timestamp_ntz, text string, lang string"


def rows_to_map(df):
    return {r["url"]: (r["text"], r["lang"], r["_ab_cdc_lsn"]) for r in df.collect()}


def test_per_column_lww(spark):
    import datetime as dt

    T = dt.datetime(2024, 1, 1)
    rows = [
        ("a", 1, None, "t1", "en"),   # full row
        ("a", 2, None, None, "de"),   # patches lang only
        ("a", 3, None, "t3", None),   # patches text only
        ("b", 1, None, "x", None),    # lang never set
    ]
    out = rows_to_map(apply_patches(spark.createDataFrame(rows, SCHEMA), ["text", "lang"]))
    # row-level LWW would have returned a = ("t3", NULL): the lsn-3 patch
    # doesn't carry lang. Per-column LWW keeps lang from lsn 2.
    assert out["a"] == ("t3", "de", 3)
    assert out["b"] == ("x", None, 1)
    assert T  # silence unused warning


def test_tombstone_drops_key_and_later_patch_recreates(spark):
    import datetime as dt

    T = dt.datetime(2024, 1, 1)
    dead = [("a", 1, None, "t", "en"), ("a", 2, T, None, None)]
    out = apply_patches(spark.createDataFrame(dead, SCHEMA), ["text", "lang"])
    assert out.count() == 0

    revived = dead + [("a", 3, None, "t3", None)]
    out2 = rows_to_map(apply_patches(spark.createDataFrame(revived, SCHEMA), ["text", "lang"]))
    # recreated: text from lsn 3; lang resurfaces from lsn 1 (document-store
    # semantics: the patch stream is the source of truth per field)
    assert out2["a"] == ("t3", "en", 3)


def test_absent_ordering_is_ignored_by_max_by(spark):
    """The operator's core assumption: max_by skips rows whose ordering
    expression is NULL — an all-absent column yields NULL, not an
    arbitrary row's NULL with a high lsn."""
    rows = [("a", 5, None, None, None), ("a", 6, None, None, "fr")]
    out = rows_to_map(apply_patches(spark.createDataFrame(rows, SCHEMA), ["text", "lang"]))
    assert out["a"] == (None, "fr", 6)
