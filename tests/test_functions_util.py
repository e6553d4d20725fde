"""Unit tests: tolerant timestamp parsing, empty-string→NULL guard,
identifier normalization, unnest-to-child-table."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from airbyte_spark.functions.names import normalize_identifier, normalize_identifier_col
from airbyte_spark.functions.timestamps import (
    empty_string_to_null,
    parse_date_tolerant,
    parse_timestamp_tolerant,
)
from airbyte_spark.operators.unnest import unnest_child

T = dt.datetime(2024, 3, 5, 12, 30, 45)


def test_parse_timestamp_variants(spark):
    """The reference's fixture variants (messages.txt:1-5): naive ISO, Z,
    +00, +0000, +00:00, fractional, SQL-style, empty, garbage."""
    rows = [
        ("2024-03-05T12:30:45",),
        ("2024-03-05T12:30:45Z",),
        ("2024-03-05T12:30:45+00",),
        ("2024-03-05T12:30:45+0000",),
        ("2024-03-05T12:30:45+00:00",),
        ("2024-03-05T12:30:45.123456+00:00",),
        ("2024-03-05 12:30:45",),
        ("",),
        ("  ",),
        ("not a time",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "s string")
    got = [r[0] for r in df.select(parse_timestamp_tolerant(F.col("s"))).collect()]
    assert got[:5] == [T] * 5
    assert got[5] == T.replace(microsecond=123456)
    assert got[6] == T
    assert got[7:] == [None, None, None, None]


def test_parse_timestamp_offset_normalizes_to_utc(spark):
    df = spark.createDataFrame([("2024-03-05T14:30:45+02:00",)], "s string")
    got = df.select(parse_timestamp_tolerant(F.col("s"))).collect()[0][0]
    assert got == T  # 14:30+02:00 == 12:30 UTC


def test_empty_string_to_null_guard(spark):
    df = spark.createDataFrame([("",), (" ",), ("x",), (None,)], "s string")
    got = [r[0] for r in df.select(empty_string_to_null(F.col("s"))).collect()]
    assert got == [None, None, "x", None]


def test_parse_date_tolerant(spark):
    df = spark.createDataFrame(
        [("2024-03-05",), ("2024/03/05",), ("03/05/2024",), ("",)], "s string"
    )
    got = [r[0] for r in df.select(parse_date_tolerant(F.col("s"))).collect()]
    assert got == [dt.date(2024, 3, 5)] * 3 + [None]


def test_normalize_identifier_rules():
    assert normalize_identifier("My Column-Name!") == "my_column_name_"
    assert normalize_identifier("2fast") == "_2fast"
    assert normalize_identifier("select") == "select_"
    assert normalize_identifier("ok_name") == "ok_name"
    assert len(normalize_identifier("x" * 100)) == 63


def test_normalize_identifier_col_matches_python(spark):
    names = ["My Column-Name!", "2fast", "select", "ok_name", "Ünïcode Key"]
    df = spark.createDataFrame([(n,) for n in names], "s string")
    got = [r[0] for r in df.select(normalize_identifier_col(F.col("s"))).collect()]
    assert got == [normalize_identifier(n) for n in names]


def test_normalize_identifier_dialect_caps():
    from airbyte_spark.functions.names import DIALECT_MAX_LEN

    long = "col_" + "x" * 300
    # every dialect enforces its documented cap
    for d, cap in DIALECT_MAX_LEN.items():
        out = normalize_identifier(long, dialect=d)
        assert len(out) == cap, (d, len(out))
    # Redshift 127 > Postgres 63 > nothing truncated at MySQL 64 for short names
    assert len(normalize_identifier(long, dialect="redshift")) == 127
    assert len(normalize_identifier(long, dialect="mysql")) == 64
    assert normalize_identifier("ok_name", dialect="mysql") == "ok_name"
    # reserved words + leading digits still escaped under a dialect
    assert normalize_identifier("select", dialect="redshift") == "select_"
    assert normalize_identifier("2fast", dialect="mysql") == "_2fast"


def test_normalize_identifier_hash_truncation_distinct():
    # two names that agree up to the cap must stay distinct post-truncation
    base = "y" * 200
    a = normalize_identifier(base + "a", dialect="postgres")
    b = normalize_identifier(base + "b", dialect="postgres")
    assert len(a) == len(b) == 63 and a != b
    # deterministic
    assert a == normalize_identifier(base + "a", dialect="postgres")
    # default (dialect-less) path is the round-1 contract: plain truncation
    assert normalize_identifier(base + "a") == normalize_identifier(base + "b")


def test_normalize_identifier_ascii_fold():
    assert normalize_identifier("Café Münü", dialect="bigquery") == "cafe_munu"
    assert normalize_identifier("Straße", dialect="oracle") == "strase"
    # non-ascii-only dialects keep the '_' sweep for accents
    assert normalize_identifier("Café", dialect="postgres") == "caf_"


def test_normalize_identifier_dialect_col_matches_python(spark):
    names = ["Café Münü", "Straße", "select", "2fast", "ok_name", "z" * 400]
    df = spark.createDataFrame([(n,) for n in names], "s string")
    for d in ("bigquery", "oracle", "redshift", "mysql"):
        got = [
            r[0]
            for r in df.select(normalize_identifier_col(F.col("s"), dialect=d)).collect()
        ]
        assert got == [normalize_identifier(n, dialect=d) for n in names], d


def test_normalize_identifier_unknown_dialect():
    import pytest

    with pytest.raises(ValueError):
        normalize_identifier("x", dialect="dbase")


def test_unnest_child_basic(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "b"]),
            (2, None),       # null array → no children (null-safety filter)
            (3, []),         # empty array → no children
            (4, ["z"]),
        ],
        "pid int, vals array<string>",
    )
    out = unnest_child(df, "vals", ["pid"], value_alias="val").collect()
    got = sorted((r["pid"], r["_idx"], r["val"], r["_parent_hashid"]) for r in out)
    import hashlib

    h = lambda x: hashlib.md5(str(x).encode()).hexdigest()  # noqa: E731
    assert got == [
        (1, 1, "a", h(1)),
        (1, 2, "b", h(1)),
        (4, 1, "z", h(4)),
    ]


def test_unnest_child_composite_parent_key(spark):
    df = spark.createDataFrame(
        [("u", 7, ["x"])], "a string, b int, vals array<string>"
    )
    out = unnest_child(df, "vals", ["a", "b"]).collect()
    import hashlib

    assert out[0]["_parent_hashid"] == hashlib.md5(b"u-7").hexdigest()


def test_unnest_child_recursive_two_levels(spark):
    from airbyte_spark.operators.unnest import unnest_child_recursive

    df = spark.createDataFrame(
        [
            (1, [("t1", ["x", "y"]), ("t2", ["z"])]),
            (2, [("t3", None)]),          # null inner array → no grandchildren
            (3, [("t4", [])]),            # empty inner array → none
            (4, None),                    # null outer array → nothing at all
        ],
        "pid int, vals array<struct<tag:string, subs:array<string>>>",
    )
    out = unnest_child_recursive(
        df, [("vals", "item"), ("item.subs", "val")], ["pid"]
    ).collect()
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    got = sorted(
        (r["pid"], r["_idx_l1"], r["_idx"], r["val"], r["_parent_hashid"])
        for r in out
    )
    # chained hashid: md5(md5(pid) || '-' || level-1 idx)
    ph = lambda pid, i1: md5(f"{md5(str(pid))}-{i1}")  # noqa: E731
    assert got == [
        (1, 1, 1, "x", ph(1, 1)),
        (1, 1, 2, "y", ph(1, 1)),
        (1, 2, 1, "z", ph(1, 2)),
    ]


def test_unnest_child_recursive_three_levels_no_shuffle(spark):
    from airbyte_spark.operators.unnest import unnest_child_recursive

    df = spark.createDataFrame(
        [(7, [[["a", "b"], ["c"]], [["d"]]])],
        "pid int, l1 array<array<array<string>>>",
    )
    out = unnest_child_recursive(
        df, [("l1", "v1"), ("v1", "v2"), ("v2", "val")], ["pid"]
    )
    rows = sorted(
        (r["_idx_l1"], r["_idx_l2"], r["_idx"], r["val"]) for r in out.collect()
    )
    assert rows == [
        (1, 1, 1, "a"),
        (1, 1, 2, "b"),
        (1, 2, 1, "c"),
        (2, 1, 1, "d"),
    ]
    # every level is a narrow explode: no Exchange anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
