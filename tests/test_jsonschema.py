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
