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

import pyspark.sql.functions as F
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
    dialect: str | None = None,
) -> str:
    """Write one stream to `<dest_dir>/<normalized stream>.<fmt>/`.

    mode: "overwrite" (full refresh) | "append" (adds a part subdir).
    dialect: per-destination identifier rules (names.DIALECT_MAX_LEN — the
    reference normalizes per target warehouse); None keeps the default
    63-cap contract.
    Returns the promoted path.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {sorted(_FORMATS)}")
    if mode not in ("overwrite", "append"):
        raise ValueError("mode must be overwrite|append")
    out = df.select(
        *[df[c].alias(normalize_identifier(c, dialect=dialect)) for c in df.columns]
    )
    table = normalize_identifier(stream, dialect=dialect)
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


def export_shards(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2048,
    n_shards: int = 16,
) -> dict:
    """Training-shard export: pack the corpus (operators/corpus.
    pack_sequences) and write one parquet file per shard — ordered by id
    within the shard, rows carrying (seq_id, offset, n_tokens) so a
    packed-pretraining loader can split sequences without re-tokenizing —
    plus a content MANIFEST the consuming trainer can verify against
    (per shard: docs, tokens, sequences, an order-insensitive checksum).

    Determinism is the point: md5 sharding + id ordering + tmp-then-swap
    promotion mean re-running the export over the same corpus produces
    byte-identical shard assignments and the same manifest — resumable
    and diffable, like every other sink in this engine.

    Scale shape: ONE shuffle (hash by shard; repartition→sortWithin keeps
    each shard a single sorted task/file), manifest is a shard-count-row
    aggregate. No driver-side data."""
    import json
    import shutil

    from airbyte_spark.operators.corpus import pack_sequences

    packed = pack_sequences(
        docs, id_col=id_col, text_col=text_col,
        max_tokens=max_tokens, n_shards=n_shards,
    )
    rows = packed.join(docs.select(id_col, text_col), id_col)

    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        rows.repartition(n_shards, "shard")
        .sortWithinPartitions(id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(tmp)
    )

    # order-insensitive per-shard checksum: sum of a 48-bit slice of each
    # row's md5(id || ':' || n_tokens) — cheap, engine-portable, catches
    # dropped/duplicated/renumbered docs
    chk = F.conv(F.substring(F.md5(F.concat_ws(":", id_col, "n_tokens")), 1, 12), 16, 10)
    manifest_rows = (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            (F.max("seq_id") + 1).cast("long").alias("n_sequences"),
            F.sum(chk.cast("decimal(30,0)")).cast("string").alias("checksum"),
        )
        .collect()
    )
    manifest = {
        "max_tokens": max_tokens,
        "n_shards": n_shards,
        "shards": {
            str(r["shard"]): {
                "n_docs": r["n_docs"],
                "n_tokens": r["n_tokens"],
                "n_sequences": r["n_sequences"],
                "checksum": r["checksum"],
            }
            for r in manifest_rows
        },
    }
    with open(f"{tmp}/_manifest.json", "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.move(tmp, out_dir)
    return manifest
