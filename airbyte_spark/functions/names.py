"""Identifier normalization for arbitrary JSON keys → SQL-safe column names.

Restates the reference's destination name transformer semantics
(base-normalization normalization/transform_catalog/
destination_name_transformer.py:19-110: special characters → '_',
case-folding, reserved-keyword escaping, per-destination length caps) as
one deterministic rule set:

  1. lowercase
  2. every char outside [a-z0-9_] → '_'
  3. leading digit → prefix '_' (identifiers can't start with a number)
  4. reserved SQL keyword → suffix '_'
  5. truncate to max_len (default 63, the Postgres limit the reference
     encodes per destination)

Exposed both as a plain-Python function (for schema/StructField names at
plan-build time — driver-side, tiny) and as a column expression (for
normalizing identifier-valued DATA at scale, fully codegen'd)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

# Compact core of the reference's reserved_keywords.py (2548 LoC of
# per-warehouse tables): the ANSI words that actually collide in practice.
RESERVED = {
    "select", "from", "where", "group", "order", "by", "table", "column",
    "insert", "update", "delete", "join", "inner", "outer", "left", "right",
    "union", "all", "distinct", "as", "on", "and", "or", "not", "null",
    "true", "false", "case", "when", "then", "else", "end", "create",
    "drop", "alter", "index", "primary", "key", "default", "user",
}

DEFAULT_MAX_LEN = 63  # Postgres identifier limit (the reference's floor)

# Per-destination identifier length caps, restating the reference's
# destination-specific truncation table (destination_name_transformer.py:
# 19-110 keys the same warehouse → limit map; values below are the
# documented public limits for each engine). ascii_only marks dialects
# whose identifier charset excludes non-ASCII, so accented letters are
# transliterated (NFKD fold) before the charset sweep instead of
# collapsing to '_'.
DIALECT_MAX_LEN = {
    "postgres": 63,
    "redshift": 127,
    "mysql": 64,
    "snowflake": 255,
    "bigquery": 300,
    "mssql": 128,
    "oracle": 128,
}
ASCII_ONLY_DIALECTS = {"bigquery", "oracle"}

# NFKD-foldable accent map for the column expression path (F.translate is
# codegen'd; Spark has no unicode-normalize builtin). Covers Latin-1
# Supplement + the common Latin Extended-A letters; anything outside the
# map falls through to the [^a-z0-9_] → '_' sweep, same as the reference's
# fallback for untransliterable characters.
_ACCENT_SRC = "àáâãäåāăąçćčďđèéêëēĕėęěìíîïĩīĭįıñńňòóôõöøōŏőŕřśšşťùúûüũūŭůűýÿžźżß"
_ACCENT_DST = "aaaaaaaaacccddeeeeeeeeeiiiiiiiiinnnooooooooorrssstuuuuuuuuuyyzzzs"
assert len(_ACCENT_SRC) == len(_ACCENT_DST)


_ACCENT_TABLE = str.maketrans(_ACCENT_SRC, _ACCENT_DST)


def _fold_accents(name: str) -> str:
    # Table-driven (not NFKD) so the plain-Python and column-expression
    # paths transliterate identically by construction; characters outside
    # the table fall to '_' in both.
    return name.lower().translate(_ACCENT_TABLE)


def _hash_truncate(out: str, max_len: int) -> str:
    """Reference-style middle-hash truncation: names over the cap keep a
    readable prefix plus an 8-hex digest of the FULL name, so two long
    names differing only past the cap stay distinct (the reference's
    truncate-with-hash rule in destination_name_transformer.py)."""
    import hashlib

    if len(out) <= max_len:
        return out
    digest = hashlib.md5(out.encode()).hexdigest()[:8]
    return out[: max_len - 9] + "_" + digest


def normalize_identifier(
    name: str, max_len: int = DEFAULT_MAX_LEN, dialect: str | None = None
) -> str:
    """Normalize one identifier. With `dialect`, the destination's length
    cap applies, over-cap names truncate with a uniqueness-preserving hash
    suffix, and ascii-only dialects fold accents first. The default
    (dialect=None) path is the round-1 contract: plain truncation at 63,
    unchanged for existing callers and the gated query."""
    if dialect is not None:
        if dialect not in DIALECT_MAX_LEN:
            raise ValueError(f"unknown dialect {dialect!r}; one of {sorted(DIALECT_MAX_LEN)}")
        max_len = DIALECT_MAX_LEN[dialect]
        if dialect in ASCII_ONLY_DIALECTS:
            name = _fold_accents(name)
    out = re.sub(r"[^a-z0-9_]", "_", name.lower())
    if re.match(r"^[0-9]", out):
        out = "_" + out
    if out in RESERVED:
        out = out + "_"
    return _hash_truncate(out, max_len) if dialect is not None else out[:max_len]


def normalize_identifier_col(
    col: Column, max_len: int = DEFAULT_MAX_LEN, dialect: str | None = None
) -> Column:
    """Column-expression form (fully codegen'd — no UDF). Same dialect
    semantics as normalize_identifier: translate-table accent fold for
    ascii-only dialects, hash-suffix truncation past the dialect cap."""
    if dialect is not None:
        if dialect not in DIALECT_MAX_LEN:
            raise ValueError(f"unknown dialect {dialect!r}; one of {sorted(DIALECT_MAX_LEN)}")
        max_len = DIALECT_MAX_LEN[dialect]
        if dialect in ASCII_ONLY_DIALECTS:
            col = F.translate(F.lower(col), _ACCENT_SRC, _ACCENT_DST)
    out = F.regexp_replace(F.lower(col), "[^a-z0-9_]", "_")
    out = F.when(out.rlike("^[0-9]"), F.concat(F.lit("_"), out)).otherwise(out)
    out = F.when(out.isin(*sorted(RESERVED)), F.concat(out, F.lit("_"))).otherwise(out)
    if dialect is None:
        return F.substring(out, 1, max_len)
    return F.when(
        F.length(out) <= max_len, out
    ).otherwise(
        F.concat(
            F.substring(out, 1, max_len - 9),
            F.lit("_"),
            F.substring(F.md5(out.cast("binary")), 1, 8),
        )
    )


def camel_to_snake(s: str) -> str:
    """camelCase/PascalCase → snake_case (≡ sources/utils/casing.py:10-12,
    same two-step regex) — the stream/field casing rule HTTP sources apply
    before identifier normalization."""
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", s)
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s).lower()
