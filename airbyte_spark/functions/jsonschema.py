"""Vectorized JSON-schema-subset record validation.

The reference validates every message against a JSON schema and filters
failures before they reach the sink (AirbyteProtocolPredicate.java:13-27
wrapping JsonSchemaValidator.java; BufferedStreamConsumer counts the
drops). Re-expressed Spark-first: the schema subset below compiles to
pure column expressions (get_json_object + regex shape checks — JVM-side,
fused into the scan, zero shuffles, no UDF), so validating 10^10 records
costs one map stage.

Supported subset (flat objects — the shape of change-event envelopes):
  {"required": [name...],
   "properties": {name: {"type": "integer"|"number"|"boolean"|"string"}}}

Semantics, chosen to be oracle-checkable in DuckDB with the same rules:
  - unparseable / NULL document        -> "malformed json"
  - required name absent OR JSON null  -> "missing required: <name>"
  - present value failing the type's lexical shape -> "type: <name>"
    (integer/number/boolean check the extracted token; string checks the
    raw text for a quoted value — exact enough for flat envelopes, and
    every rule has a DuckDB twin: json_valid / json_extract_string /
    regexp_matches)

Violations come back as a sorted array so valid rows have size 0 — the
dead-letter split is then one filter each way (same pattern as the
Debezium parse dead-letter, sources/debezium.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_TYPE_SHAPE = {
    "integer": r"^-?\d+$",
    "number": r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$",
    "boolean": r"^(true|false)$",
}


def json_violations(col: Column, schema: dict) -> Column:
    """Sorted array of violation labels for one JSON document column."""
    parsed = F.get_json_object(col, "$")
    malformed = col.isNull() | parsed.isNull()
    checks: list[Column] = [F.when(malformed, F.lit("malformed json"))]
    for name in schema.get("required", []):
        missing = F.get_json_object(col, f"$.{name}").isNull()
        checks.append(
            F.when(~malformed & missing, F.lit(f"missing required: {name}"))
        )
    for name, spec in schema.get("properties", {}).items():
        raw = F.get_json_object(col, f"$.{name}")
        t = spec.get("type")
        if t in _TYPE_SHAPE:
            bad = raw.isNotNull() & ~raw.rlike(_TYPE_SHAPE[t])
        elif t == "string":
            # extraction strips quotes, so check the raw text for a quoted
            # value (flat envelopes; escaped-quote edge cases documented out)
            bad = raw.isNotNull() & ~col.rlike(f'"{name}"\\s*:\\s*"')
        else:
            continue
        checks.append(F.when(~malformed & bad, F.lit(f"type: {name}")))
    return F.array_sort(
        F.filter(F.array(*checks), lambda x: x.isNotNull())
    )


def validate_json_records(
    df: DataFrame, json_col: str, schema: dict, out_col: str = "violations"
) -> DataFrame:
    """Stamp every record with its violation list and an is_valid flag."""
    v = json_violations(F.col(json_col), schema)
    return df.withColumn(out_col, v).withColumn(
        "is_valid", F.size(F.col(out_col)) == 0
    )


def split_valid(
    df: DataFrame, json_col: str, schema: dict
) -> tuple[DataFrame, DataFrame]:
    """(valid, dead_letter): the sink path and the quarantine path — ≡ the
    reference dropping invalid records while counting them per stream
    (BufferedStreamConsumer.java:141-144)."""
    stamped = validate_json_records(df, json_col, schema)
    return (
        stamped.filter(F.col("is_valid")).drop("violations", "is_valid"),
        stamped.filter(~F.col("is_valid")).drop("is_valid"),
    )


# ---- schema-driven type normalization (≡ sources/utils/transform.py) -------

_TRUE_WORDS = ("y", "yes", "t", "true", "on", "1")
_FALSE_WORDS = ("n", "no", "f", "false", "off", "0")


def _scalar_cast(col: Column, target: str) -> Column:
    if target == "integer":
        return col.try_cast("bigint")
    if target == "number":
        return col.try_cast("double")
    if target == "boolean":
        low = F.lower(F.trim(col))
        return (
            F.when(low.isin(*_TRUE_WORDS), F.lit(True))
            .when(low.isin(*_FALSE_WORDS), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    return col.cast("string")  # "string" and unknown types


def normalize_to_schema(df: DataFrame, schema: dict) -> DataFrame:
    """Schema-driven type normalization (≡ the reference TypeTransformer's
    DefaultSchemaNormalization, sources/utils/transform.py:85-120): cast
    each raw STRING property to its declared jsonschema type, tolerantly —
    strtobool-style word sets for booleans, numeric try_cast for
    integer/number, identity for string. `{"type": [X, "null"]}` unwraps
    to X; a genuinely ambiguous multi-type property is left as string
    (exactly the reference's leave-it-alone rule). Arrays of scalars parse
    via from_json element-wise then cast per item type.

    One columnar divergence, documented: the reference returns the
    ORIGINAL value when a cast fails (heterogeneous python objects); a
    typed column cannot, so failures become NULL — the same policy as
    parse_timestamp_tolerant. Pure column expressions: fused into the
    scan, zero shuffles, no UDF at 10^10 records.
    """
    props = schema.get("properties") or {}
    out = []
    for name in df.columns:
        sub = props.get(name)
        if sub is None:
            out.append(F.col(name))
            continue
        target = sub.get("type")
        if isinstance(target, list):
            nn = [t for t in target if t != "null"]
            target = nn[0] if len(nn) == 1 else "string"
        if target == "array":
            item = (sub.get("items") or {}).get("type", "string")
            if isinstance(item, list):
                nni = [t for t in item if t != "null"]
                item = nni[0] if len(nni) == 1 else "string"
            parsed = F.from_json(F.col(name), "array<string>")
            out.append(
                F.transform(parsed, lambda v: _scalar_cast(v, item)).alias(name)
            )
            continue
        out.append(_scalar_cast(F.col(name), target).alias(name))
    return df.select(*out)


# ---- driver-side config validation (≡ check_config_against_spec) -----------

_PY_TYPES = {
    "string": str,
    "integer": int,
    "number": (int, float),
    "boolean": bool,
    "array": list,
    "object": dict,
    "null": type(None),
}


def check_config_against_spec(config: dict, spec: dict) -> list[str]:
    """Validate a connector config dict against a spec's
    connectionSpecification (≡ the cdk's check_config_against_spec_or_exit,
    sources/utils/schema_helpers.py / connector.py): required presence,
    declared type(s), enum membership. Returns sorted violation strings
    (empty = valid) — callers decide raise-vs-report. Driver-side and tiny
    by construction (a config is KBs); the DATA-side validator above is the
    columnar sibling."""
    errs: list[str] = []
    props = spec.get("properties") or {}
    for name in spec.get("required") or []:
        if config.get(name) is None:
            errs.append(f"missing required: {name}")
    for name, val in config.items():
        sub = props.get(name)
        if sub is None or val is None:
            continue  # unknown keys tolerated, None handled by required
        types = sub.get("type")
        types = [types] if isinstance(types, str) else (types or [])
        if types:
            # membership test FIRST: a spec declaring an unknown type name
            # must report, not KeyError mid-comprehension
            for name_t in types:
                if name_t not in _PY_TYPES:
                    errs.append(f"unknown type: {name}: {name_t}")
            expected = tuple(
                t for name_t in types if name_t in _PY_TYPES for t in (
                    _PY_TYPES[name_t] if isinstance(_PY_TYPES[name_t], tuple)
                    else (_PY_TYPES[name_t],)
                )
            )
            if not expected:
                continue  # nothing checkable; unknown-type already reported
            # bool is an int subclass in python — don't let True pass as integer
            if isinstance(val, bool) and bool not in expected:
                errs.append(f"type: {name}")
            elif not isinstance(val, expected):
                errs.append(f"type: {name}")
        if "enum" in sub and val not in sub["enum"]:
            errs.append(f"enum: {name}")
    return sorted(errs)


def apply_config_defaults(config: dict, spec: dict) -> dict:
    """Fill absent properties from the spec's declared defaults (the cdk
    applies spec defaults the same way before a sync). Returns a new dict;
    explicit None is 'absent'."""
    out = dict(config)
    for name, sub in (spec.get("properties") or {}).items():
        if out.get(name) is None and "default" in sub:
            out[name] = sub["default"]
    return out
