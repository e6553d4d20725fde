"""Tolerant timestamp parsing + empty-string→NULL guards.

The reference's normalization dispatches several ISO-8601 variants per
warehouse dialect — fractional seconds, 'Z', '+00', '+0000', '+00:00'
offsets (base-normalization stream_processor.py:533-569, exercised by the
test_simple_streams fixture messages.txt:1-5) — and wraps every date/
timestamp cast in empty_string_to_null (stream_processor.py:505,517;
macros cross_db_utils/type_conversions.sql). This module restates both as
column expressions: a coalesce-chain of try_to_timestamp over the variant
formats (first match wins; unparseable or empty → NULL, never an error —
ANSI mode is on in Spark 4, so the try_ forms are load-bearing).

All parsing is JVM-side (whole-stage codegen); nothing here touches
Python per row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Ordered most-specific-first: fractional before whole-second, explicit
# offsets before naive. Java time patterns: X = +00|Z, XXX = +00:00|Z,
# Z = +0000.
TS_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",  # 2024-01-01T00:00:00+00:00 / ...Z
    "yyyy-MM-dd'T'HH:mm:ssZ",    # 2024-01-01T00:00:00+0000
    "yyyy-MM-dd'T'HH:mm:ssX",    # 2024-01-01T00:00:00+00
    "yyyy-MM-dd'T'HH:mm:ss",     # naive ISO
    "yyyy-MM-dd HH:mm:ss",       # SQL style
]

DATE_FORMATS = ["yyyy-MM-dd", "yyyy/MM/dd", "MM/dd/yyyy"]


def empty_string_to_null(col: Column) -> Column:
    """'' (or whitespace-only) → NULL before any date/timestamp cast —
    ≡ the reference's empty_string_to_null macro guarding type_date /
    type_timestamp_with_timezone (stream_processor.py:505-524)."""
    return F.when(F.trim(col) == "", F.lit(None)).otherwise(col)


def parse_timestamp_tolerant(col: Column) -> Column:
    """Parse any of the reference's timestamp shapes to TIMESTAMP_NTZ
    (UTC instant; offset variants normalize to UTC first). NULL for
    empty/unparseable input."""
    c = empty_string_to_null(col)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in TS_FORMATS]).cast(
        "timestamp_ntz"
    )


def parse_date_tolerant(col: Column) -> Column:
    """Tolerant DATE parse with the empty-string guard."""
    c = empty_string_to_null(col)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in DATE_FORMATS]).cast(
        "date"
    )
