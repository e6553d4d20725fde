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


def normalize_identifier(name: str, max_len: int = DEFAULT_MAX_LEN) -> str:
    out = re.sub(r"[^a-z0-9_]", "_", name.lower())
    if re.match(r"^[0-9]", out):
        out = "_" + out
    if out in RESERVED:
        out = out + "_"
    return out[:max_len]


def normalize_identifier_col(col: Column, max_len: int = DEFAULT_MAX_LEN) -> Column:
    out = F.regexp_replace(F.lower(col), "[^a-z0-9_]", "_")
    out = F.when(out.rlike("^[0-9]"), F.concat(F.lit("_"), out)).otherwise(out)
    out = F.when(out.isin(*sorted(RESERVED)), F.concat(out, F.lit("_"))).otherwise(out)
    return F.substring(out, 1, max_len)
