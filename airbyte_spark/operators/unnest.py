"""Nested/array stream normalization — unnest arrays into child tables.

≡ the reference's nested-stream handling: nested objects/arrays explode
into child tables carrying a parent hashid, guarded by a null-safety
filter on the array column (base-normalization stream_processor.py:
1113-1125 `cross join unnest(...)` + `WHERE <col> IS NOT NULL`; macros
cross_db_utils/array.sql:13-63; fixture test_nested_streams). The parent
hashid is the dbt_utils.surrogate_key form — md5 over '-'-joined coalesced
string casts (stream_processor.py:577-584).

Scale shape: explode is a narrow transformation (no shuffle) — child rows
are produced in place in the parent's partitions and inherit its
partitioning; at 100 TB the child table is written partitioned by the
parent's bucket so parent⋈child joins stay co-located.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def surrogate_key(cols: list[str]):
    """md5 of '-'-joined coalesced string casts ≡ dbt_utils.surrogate_key
    (reference stream_processor.py:577-584; cross_db_utils/surrogate_key.sql)."""
    return F.md5(
        F.concat_ws(
            "-", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
        )
    )


def unnest_child(
    df: DataFrame,
    array_col: str,
    parent_keys: list[str],
    value_alias: str = "value",
    index_alias: str = "_idx",
) -> DataFrame:
    """Explode one array column into a child table:

      (_parent_hashid, *parent_keys, _idx 1-based, value)

    Rows whose array is NULL produce no children (the reference's
    null-safety filter); empty arrays likewise. 1-based _idx matches SQL
    ordinality (DuckDB generate_subscripts / Postgres WITH ORDINALITY),
    keeping the child table oracle-comparable."""
    filtered = df.filter(F.col(array_col).isNotNull())
    return filtered.select(
        surrogate_key(parent_keys).alias("_parent_hashid"),
        *parent_keys,
        F.posexplode(F.col(array_col)).alias("_pos", value_alias),
    ).select(
        "_parent_hashid",
        *parent_keys,
        (F.col("_pos") + 1).cast("long").alias(index_alias),
        value_alias,
    )


def unnest_child_recursive(
    df: DataFrame,
    levels: list[tuple[str, str]],
    parent_keys: list[str],
    index_alias: str = "_idx",
) -> DataFrame:
    """Recursively normalize children-of-children, matching the reference's
    child-processor recursion (base-normalization stream_processor.py:
    332-366 recurses into each nested stream's own nested streams; fixture
    test_nested_streams has the two-level case).

    `levels` is the descent path: [(array_accessor, value_alias), ...] —
    the first accessor is a column of `df`; each later one is resolved
    against the previous level's exploded value (dotted struct access such
    as "item.subs" works). Parent hashids CHAIN: level k's _parent_hashid
    is the surrogate key of level k-1's identifying pair
    (_parent_hashid, _idx), exactly how the reference feeds the child's
    hashid into the grandchild's foreign key. Ancestor indexes are kept as
    _idx_l1.._idx_l{k-1} so the deepest table remains joinable to every
    ancestor level.

    Returns the DEEPEST child table:
      (_parent_hashid, *parent_keys, _idx_l1.., _idx, value)

    NULL arrays at ANY level produce no descendants (the reference's
    null-safety filter, applied per level); empty arrays likewise. Scale
    shape: every level is a narrow posexplode in the parent's partitions —
    no shuffle at any depth."""
    if not levels:
        raise ValueError("levels must name at least one array to unnest")
    arr0, alias0 = levels[0]
    out = unnest_child(df, arr0, parent_keys, value_alias=alias0, index_alias=index_alias)
    ancestors: list[str] = []
    for depth, (acc, alias) in enumerate(levels[1:], start=1):
        anc = f"{index_alias}_l{depth}"
        filtered = out.filter(F.col(acc).isNotNull())
        out = filtered.select(
            surrogate_key(["_parent_hashid", index_alias]).alias("_ph"),
            *parent_keys,
            *ancestors,
            F.col(index_alias).alias(anc),
            F.posexplode(F.col(acc)).alias("_pos", alias),
        ).select(
            F.col("_ph").alias("_parent_hashid"),
            *parent_keys,
            *ancestors,
            anc,
            (F.col("_pos") + 1).cast("long").alias(index_alias),
            alias,
        )
        ancestors.append(anc)
    return out
