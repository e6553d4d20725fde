"""Schemas, the JSON-schema→Spark type mapping, and catalog-diff rules.

The payload schema is fixed by the engine contract: Common-Crawl-style web
pages (url, warc_ts, html, text, lang). The CDC envelope mirrors the
reference's CDC metadata columns
(`bases/debezium/.../DebeziumEventUtils.java:19-20,46-65`,
`docs/understanding-airbyte/cdc.md:15-20`):
_ab_cdc_updated_at, _ab_cdc_deleted_at (non-null ⇒ tombstone), _ab_cdc_lsn
(monotone total-order tiebreaker), plus _emitted_at (≡ _airbyte_emitted_at,
`base-java/.../JavaBaseConstants.java:17-19`) and checkpoint_id (≡ the
AirbyteStateMessage boundary, airbyte_protocol.yaml:67-76).

Catalog-diff rules re-express the reference's schema-evolution behavior
(golden scenario `test_normalization.py:126-137`: add column, widen type,
drop column-is-ignored) as StructType diffs applied to the lake table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# --- payload + envelope schemas ------------------------------------------------

PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampNTZType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

CDC_META_FIELDS = [
    StructField("_ab_cdc_updated_at", TimestampNTZType(), True),
    StructField("_ab_cdc_deleted_at", TimestampNTZType(), True),
    StructField("_ab_cdc_lsn", LongType(), False),
    StructField("_emitted_at", TimestampNTZType(), True),
    StructField("checkpoint_id", LongType(), False),
]

CHANGE_SCHEMA = StructType([*PAGE_SCHEMA.fields, *CDC_META_FIELDS])

# Columns the merge keeps in the target beyond the payload: the LSN makes
# replay deterministic under exact warc_ts ties (reference tiebreaker chain,
# stream_processor.py:769-783 uses _ab_cdc_log_pos the same way), and
# _ab_cdc_deleted_at persists tombstones so that a late (older-cursor) event
# delivered in a later batch cannot resurrect a deleted key — the reference
# gets the same property by keeping delete rows in the SCD history table and
# filtering them from the active view (stream_processor.py:759-768). Expired
# tombstones are garbage-collected past a watermark (expire_tombstones).
TARGET_META_COLS = ["_ab_cdc_lsn", "_ab_cdc_deleted_at"]


# --- JSON-schema primitive → Spark type (reference type system, SURVEY §1.2) ---

_JSON_TO_SPARK: dict[str, DataType] = {
    "string": StringType(),
    "integer": LongType(),
    "number": DoubleType(),
    "boolean": BooleanType(),
    "date": DateType(),
    "date-time": TimestampNTZType(),
    "object": StringType(),  # kept as JSON blob unless a struct is configured
    "array": ArrayType(StringType()),
}


def json_type_to_spark(json_type: str, fmt: str | None = None) -> DataType:
    """Map a JSON-schema primitive (+format) to a Spark type.

    Mirrors base-normalization's dbt type macros
    (stream_processor.py:488-531): string→varchar, integer→bigint,
    number→float, boolean→boolean, string+date→date,
    string+date-time→timestamptz.
    """
    if json_type == "string" and fmt in ("date", "date-time"):
        return _JSON_TO_SPARK[fmt]
    return _JSON_TO_SPARK[json_type]


# Widening lattice: "boolean < integer < number < string"
# (stream_processor.py:492). A promotion is legal if it moves up the chain.
_WIDEN_ORDER = ["boolean", "bigint", "double", "string"]


def _widen_rank(dt: DataType) -> int:
    name = dt.simpleString()
    return _WIDEN_ORDER.index(name) if name in _WIDEN_ORDER else -1


# --- catalog diff ---------------------------------------------------------------


@dataclass(frozen=True)
class AddColumn:
    name: str
    dtype: DataType


@dataclass(frozen=True)
class PromoteType:
    name: str
    old: DataType
    new: DataType


@dataclass(frozen=True)
class IncompatibleChange:
    name: str
    old: DataType
    new: DataType


def diff_schemas(
    old: StructType, new: StructType
) -> list[AddColumn | PromoteType | IncompatibleChange]:
    """Compute evolution actions to take `old` → superset of `new`.

    Rules (reference golden scenario, catalog_schema_change.json vs
    catalog.json + test_normalization.py:126-137):
    - column only in new      → AddColumn (old rows read as NULL)
    - type widened            → PromoteType (boolean<integer<number<string)
    - column dropped from new → ignored (history preserved; reference keeps
      the column in the final table and new rows have NULL)
    - narrowing / unrelated   → IncompatibleChange (caller decides; the
      reference re-casts via SQL which can fail per-row — we refuse)
    """
    actions: list[AddColumn | PromoteType | IncompatibleChange] = []
    old_by_name = {f.name: f for f in old.fields}
    for f in new.fields:
        if f.name not in old_by_name:
            actions.append(AddColumn(f.name, f.dataType))
            continue
        o = old_by_name[f.name].dataType
        if o == f.dataType:
            continue
        ro, rn = _widen_rank(o), _widen_rank(f.dataType)
        if 0 <= ro < rn:
            actions.append(PromoteType(f.name, o, f.dataType))
        else:
            actions.append(IncompatibleChange(f.name, o, f.dataType))
    return actions


def evolve(old: StructType, new: StructType) -> StructType:
    """Apply diff_schemas actions, raising on incompatible changes."""
    actions = diff_schemas(old, new)
    bad = [a for a in actions if isinstance(a, IncompatibleChange)]
    if bad:
        raise ValueError(f"incompatible schema changes: {bad}")
    fields = list(old.fields)
    by_name = {f.name: i for i, f in enumerate(fields)}
    for a in actions:
        if isinstance(a, AddColumn):
            fields.append(StructField(a.name, a.dtype, True))
        elif isinstance(a, PromoteType):
            i = by_name[a.name]
            fields[i] = StructField(a.name, a.new, fields[i].nullable)
    return StructType(fields)
