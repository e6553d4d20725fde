"""Property-based tests (hypothesis) for the pure-function surfaces —
the §5 analogue of the reference's generator-driven normalization tests.

Spark-touching properties batch many generated rows into ONE DataFrame
per example and keep max_examples small, so the suite cost stays bounded.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from airbyte_spark.functions.names import (
    DIALECT_MAX_LEN,
    camel_to_snake,
    normalize_identifier,
)

_any_name = st.text(min_size=0, max_size=200)
_dialect = st.sampled_from([None, *sorted(DIALECT_MAX_LEN)])


@given(_any_name, _dialect)
@settings(max_examples=300, deadline=None)
def test_normalize_identifier_invariants(name, dialect):
    out = normalize_identifier(name, dialect=dialect)
    cap = DIALECT_MAX_LEN[dialect] if dialect else 63
    # charset + length invariants hold for ANY input
    assert re.fullmatch(r"[a-z0-9_]*", out), out
    assert len(out) <= cap
    assert not re.match(r"^[0-9]", out)
    # deterministic
    assert out == normalize_identifier(name, dialect=dialect)
    # idempotent: a normalized name re-normalizes to itself (the output
    # charset never triggers the sweep, reserved words got their suffix,
    # and hash-truncated names are already under the cap)
    assert normalize_identifier(out, dialect=dialect) == out


@given(st.text(alphabet=st.characters(categories=("Lu", "Ll", "Nd")), max_size=60))
@settings(max_examples=300, deadline=None)
def test_camel_to_snake_idempotent(s):
    once = camel_to_snake(s)
    assert camel_to_snake(once) == once
    assert once == once.lower()


@given(
    st.dictionaries(
        st.sampled_from(["source", "target", "n_buckets", "write_mode", "extra"]),
        st.one_of(st.text(max_size=5), st.integers(), st.booleans(), st.none()),
        max_size=5,
    )
)
@settings(max_examples=300, deadline=None)
def test_config_spec_required_monotonic(config):
    """Removing a present required key can only ADD violations; a config
    that validates keeps validating after dropping unknown keys."""
    from airbyte_spark.functions.jsonschema import check_config_against_spec

    spec = {
        "required": ["source", "target"],
        "properties": {
            "source": {"type": "string"},
            "target": {"type": "string"},
            "n_buckets": {"type": "integer"},
            "write_mode": {"type": "string", "enum": ["cow", "mor"]},
        },
    }
    errs = check_config_against_spec(config, spec)
    assert errs == sorted(errs)
    if config.get("source") is not None:
        dropped = {k: v for k, v in config.items() if k != "source"}
        assert "missing required: source" in check_config_against_spec(dropped, spec)
    without_unknown = {k: v for k, v in config.items() if k != "extra"}
    assert check_config_against_spec(without_unknown, spec) == errs


@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcdefg hij", min_size=1, max_size=8).map(
                lambda w: w.replace(" ", "x") or "x"
            ),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=3, deadline=None)
def test_chunk_reassembly_property(spark, word_lists):
    """For ANY word sequence: chunks reassemble to the exact text and
    word counts are conserved (content-defined boundaries lose nothing)."""
    from airbyte_spark.operators.corpus import content_defined_chunks

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in content_defined_chunks(df).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for i, ws in enumerate(rows):
        parts = [t for _cid, t in sorted(got[i])]
        assert " ".join(parts) == rows[i][1]


@given(
    st.lists(
        st.datetimes(
            min_value=__import__("datetime").datetime(1971, 1, 1),
            max_value=__import__("datetime").datetime(2199, 12, 31),
        ).map(lambda d: d.replace(microsecond=0)),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=3, deadline=None)
def test_timestamp_roundtrip_property(spark, stamps):
    """Every serialization variant of ANY second-precision datetime parses
    back to the identical instant."""
    import pyspark.sql.functions as F

    from airbyte_spark.functions.timestamps import parse_timestamp_tolerant

    fmts = [
        lambda d: d.isoformat(),
        lambda d: d.isoformat() + "Z",
        lambda d: d.isoformat() + "+00:00",
        lambda d: d.isoformat() + "+0000",
        lambda d: d.strftime("%Y-%m-%d %H:%M:%S"),
    ]
    rows = [
        (i * len(fmts) + j, fmt(d), d)
        for i, d in enumerate(stamps)
        for j, fmt in enumerate(fmts)
    ]
    df = spark.createDataFrame(rows, "id long, raw string, want timestamp_ntz")
    bad = df.select(
        parse_timestamp_tolerant(F.col("raw")).alias("got"), "want"
    ).filter("got IS DISTINCT FROM want")
    assert bad.count() == 0, bad.limit(5).collect()
