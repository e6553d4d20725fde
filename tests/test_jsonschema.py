"""JSON-schema-subset record validation (functions/jsonschema.py)."""

from airbyte_spark.functions.jsonschema import (
    split_valid,
    validate_json_records,
)

SCHEMA = {
    "required": ["id", "name"],
    "properties": {
        "id": {"type": "integer"},
        "score": {"type": "number"},
        "ok": {"type": "boolean"},
        "name": {"type": "string"},
    },
}

ROWS = [
    (1, '{"id": 7, "name": "a", "score": 1.5, "ok": true}'),   # valid
    (2, '{"id": 7, "name": "a"}'),                              # valid (optionals absent)
    (3, 'not json at all'),                                     # malformed
    (4, None),                                                  # malformed
    (5, '{"id": 7}'),                                           # missing name
    (6, '{"id": "seven", "name": "a"}'),                        # type: id
    (7, '{"id": 7, "name": 42}'),                               # type: name
    (8, '{"id": 7, "name": "a", "score": "high"}'),             # type: score
    (9, '{"id": 7, "name": "a", "ok": "yes"}'),                 # type: ok
    (10, '{"id": null, "name": "a"}'),                          # JSON null ≡ missing
    (11, '{"id": -12, "name": "a", "score": 2e3, "ok": false}'),  # valid
]


def test_violation_labels(spark):
    df = spark.createDataFrame(ROWS, "rid bigint, doc string")
    got = {
        r["rid"]: list(r["violations"])
        for r in validate_json_records(df, "doc", SCHEMA).collect()
    }
    assert got[1] == [] and got[2] == [] and got[11] == []
    assert got[3] == ["malformed json"] and got[4] == ["malformed json"]
    assert got[5] == ["missing required: name"]
    assert got[6] == ["type: id"]
    assert got[7] == ["type: name"]
    assert got[8] == ["type: score"]
    assert got[9] == ["type: ok"]
    assert got[10] == ["missing required: id"]


def test_split_valid_partitions_exactly(spark):
    df = spark.createDataFrame(ROWS, "rid bigint, doc string")
    valid, dead = split_valid(df, "doc", SCHEMA)
    ok = sorted(r["rid"] for r in valid.collect())
    bad = sorted(r["rid"] for r in dead.collect())
    assert ok == [1, 2, 11]
    assert bad == [3, 4, 5, 6, 7, 8, 9, 10]
    assert "violations" in dead.columns  # quarantine keeps the evidence
    assert "violations" not in valid.columns


def test_multiple_violations_sorted(spark):
    df = spark.createDataFrame(
        [(1, '{"id": "x", "score": "y"}')], "rid bigint, doc string"
    )
    r = validate_json_records(df, "doc", SCHEMA).collect()[0]
    assert list(r["violations"]) == [
        "missing required: name",
        "type: id",
        "type: score",
    ]


def test_normalize_to_schema_default_casts(spark):
    """≡ TypeTransformer DefaultSchemaNormalization (transform.py:85-120):
    tolerant per-property casting to the declared jsonschema type."""
    from airbyte_spark.functions.jsonschema import normalize_to_schema

    schema = {
        "properties": {
            "i": {"type": ["integer", "null"]},
            "n": {"type": "number"},
            "b": {"type": "boolean"},
            "s": {"type": "string"},
            "multi": {"type": ["integer", "string"]},  # ambiguous → string
            "arr": {"type": "array", "items": {"type": "integer"}},
        }
    }
    df = spark.createDataFrame(
        [
            ("42", "1.5", "YES", "x", "7", '["1","2"]'),
            ("1.5", "nope", "off", None, "z", '["bad"]'),
            (None, "2e3", "maybe", "9", None, None),
        ],
        "i string, n string, b string, s string, multi string, arr string",
    )
    out = normalize_to_schema(df, schema)
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields) == {
        "i": "bigint", "n": "double", "b": "boolean", "s": "string",
        "multi": "string", "arr": "array<bigint>",
    }
    rows = out.collect()
    assert (rows[0]["i"], rows[0]["n"], rows[0]["b"]) == (42, 1.5, True)
    assert rows[0]["arr"] == [1, 2]
    # int("1.5") fails → NULL (the typed-column analogue of keep-original);
    # unknown boolean word → NULL; strtobool's off → False
    assert rows[1]["i"] is None and rows[1]["n"] is None and rows[1]["b"] is False
    assert rows[1]["arr"] == [None]
    assert rows[2]["n"] == 2000.0 and rows[2]["b"] is None
    # ambiguous multi-type left as the raw string
    assert [r["multi"] for r in rows] == ["7", "z", None]
    # properties absent from the schema pass through untouched
    assert [r["s"] for r in rows] == ["x", None, "9"]


def test_camel_to_snake_matches_reference_rule():
    from airbyte_spark.functions.names import camel_to_snake

    assert camel_to_snake("userId") == "user_id"
    assert camel_to_snake("CamelCaseABCDef") == "camel_case_abc_def"
    assert camel_to_snake("already_snake") == "already_snake"
    assert camel_to_snake("HTTPResponse2XX") == "http_response2_xx"


def test_check_config_against_spec():
    from airbyte_spark.functions.jsonschema import (
        apply_config_defaults,
        check_config_against_spec,
    )

    spec = {
        "type": "object",
        "required": ["source", "target"],
        "properties": {
            "source": {"type": "string"},
            "target": {"type": "string"},
            "n_buckets": {"type": "integer", "default": 16},
            "write_mode": {"type": "string", "enum": ["cow", "mor"], "default": "cow"},
            "from_checkpoint": {"type": ["integer", "null"]},
        },
    }
    ok = {"source": "/s", "target": "/t", "n_buckets": 8, "write_mode": "mor"}
    assert check_config_against_spec(ok, spec) == []
    bad = {"source": "/s", "n_buckets": "8", "write_mode": "upsert",
           "from_checkpoint": True}
    assert check_config_against_spec(bad, spec) == [
        "enum: write_mode", "missing required: target", "type: from_checkpoint",
        "type: n_buckets",
    ]
    # a user-supplied spec with an unknown type name reports, never crashes
    odd = {"type": "object", "properties": {"x": {"type": "unknowntype"}}}
    assert check_config_against_spec({"x": 1}, odd) == ["unknown type: x: unknowntype"]
    mixed = {"type": "object",
             "properties": {"x": {"type": ["unknowntype", "integer"]}}}
    assert check_config_against_spec({"x": "s"}, mixed) == [
        "type: x", "unknown type: x: unknowntype",
    ]
    filled = apply_config_defaults({"source": "/s", "target": "/t"}, spec)
    assert filled["n_buckets"] == 16 and filled["write_mode"] == "cow"
    # unknown keys tolerated; explicit values never overwritten
    assert apply_config_defaults(ok, spec)["n_buckets"] == 8
