"""Local-file destinations: CSV / JSON-lines / parquet with tmp-then-swap.

The reference's local destinations write each stream to `_airbyte_tmp_*`
and atomically promote it on successful close
(destination-csv/.../CsvDestination.java:78-101 tmpPath→finalPath;
destination-local-json/.../LocalJsonDestination.java same shape), with
identifiers run through the name transformer first.

Spark-native: the "file" is a directory of per-task parts written fully
in parallel (a 100 TB stream writes as one distributed job — the
single-FileWriter bottleneck of the reference doesn't exist), the tmp
directory is the staging unit, and promotion is one directory rename.
Overwrite replaces the target atomically-enough for a local FS (rename
into place after removing the old target); append writes a new part
subdirectory per sync so no existing data is rewritten.

Column identifiers are normalized (functions/names.normalize_identifier ≡
the reference's StandardNameTransformer) so any JSON-ish field name
survives the CSV header / downstream SQL.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from airbyte_spark.functions.names import normalize_identifier

_FORMATS = {"csv", "json", "parquet"}


def _writer(df: DataFrame, fmt: str):
    if fmt == "csv":
        return df.write.option("header", True)
    return df.write


def write_local(
    df: DataFrame,
    dest_dir: str,
    stream: str,
    fmt: str = "csv",
    mode: str = "overwrite",
) -> str:
    """Write one stream to `<dest_dir>/<normalized stream>.<fmt>/`.

    mode: "overwrite" (full refresh) | "append" (adds a part subdir).
    Returns the promoted path.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {sorted(_FORMATS)}")
    if mode not in ("overwrite", "append"):
        raise ValueError("mode must be overwrite|append")
    out = df.select(
        *[df[c].alias(normalize_identifier(c)) for c in df.columns]
    )
    table = normalize_identifier(stream)
    final_path = os.path.join(dest_dir, f"{table}.{fmt}")
    os.makedirs(final_path if mode == "append" else dest_dir, exist_ok=True)
    sub = uuid.uuid4().hex[:12]
    tmp_path = os.path.join(dest_dir, f"_airbyte_tmp_{table}_{sub}")
    getattr(_writer(out, fmt), fmt)(tmp_path, mode="overwrite")
    if mode == "overwrite":
        if os.path.exists(final_path):
            shutil.rmtree(final_path)
        os.rename(tmp_path, final_path)
    else:
        os.rename(tmp_path, os.path.join(final_path, f"sync-{sub}"))
    return final_path


def read_local(spark: SparkSession, dest_dir: str, stream: str, fmt: str) -> DataFrame:
    """Read back a stream written by write_local (recursive over syncs)."""
    path = os.path.join(dest_dir, f"{normalize_identifier(stream)}.{fmt}")
    reader = spark.read.option("recursiveFileLookup", True)
    if fmt == "csv":
        reader = reader.option("header", True).option("inferSchema", True)
    return getattr(reader, fmt)(path)
