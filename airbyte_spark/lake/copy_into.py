"""Copy-via-object-store sink: stage objects, then COPY INTO the lake table.

The reference's warehouse destinations upload record batches as staged
objects (S3/GCS files) and then issue a warehouse-side COPY that ingests
the staged files without the destination ever re-reading them row by row
(destination-jdbc/.../copy/StreamCopier.java:14-66 prepareStagingFile →
write → copyStagingFileToTemporaryTable; GcsStreamCopier.java same over
GCS).

Spark-native equivalent over the engine's lake format: the staged objects
ARE parquet data files, so "COPY INTO" is a pure METADATA commit —
  1. `stage_objects` writes the batch as parquet into a staging prefix
     (any number of producers, any time earlier);
  2. `copy_into` moves/links the staged files under the table's data dir,
     reads only their footers for stats, and publishes ONE manifest commit
     registering them.
No record is rewritten or even re-scanned: at 100 TB a copy of N staged
files costs N renames + N footer reads + one manifest CAS, exactly like a
warehouse COPY (and unlike a naive `df.write.insertInto` which would
re-shuffle the data). The commit carries a checkpoint key, so a crashed
copy re-run is the usual idempotent no-op.

Schema safety: staged files must match the table's current schema (the
reference creates its tmp table from the staging file's schema; here the
manifest's schema_id is stamped on each registered file and a mismatch
aborts before any file is moved).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

from airbyte_spark.lake.format import (
    FileEntry,
    LakeTable,
    _collect_parquet_stats,
)


def stage_objects(df: DataFrame, staging_dir: str) -> list[str]:
    """Write a batch as parquet objects into the staging prefix.

    ≡ prepareStagingFile()+write() — except the "uploader" is a normal
    distributed parquet write (one object per task, written in parallel).
    Returns the staged object paths.
    """
    df.write.mode("overwrite").parquet(staging_dir)
    return sorted(
        os.path.join(staging_dir, n)
        for n in os.listdir(staging_dir)
        if n.endswith(".parquet")
    )


def copy_into(
    table: LakeTable,
    staging_dir: str,
    checkpoint_key: str | None = None,
    stat_cols: list[str] | None = None,
    expected_columns: list[str] | None = None,
) -> int:
    """Register staged parquet objects into the table in one commit.

    Files are moved (same-filesystem rename; at deployment an object-store
    server-side copy) under data/copy-<id>/ and become visible atomically
    at manifest publish. Returns the new table version.
    """
    staged = [
        os.path.join(staging_dir, n)
        for n in sorted(os.listdir(staging_dir))
        if n.endswith(".parquet")
    ]
    if not staged:
        raise ValueError(f"no staged parquet objects in {staging_dir}")
    m = table.manifest()
    if checkpoint_key is not None and checkpoint_key in m["committed"]:
        return m["version"]  # idempotent re-copy
    sid = int(m["schema_id"])
    if table.partition_spec().fields:
        # Staged objects carry no partition directory metadata; registering
        # them into a bucketed table would silently defeat the merge path's
        # per-bucket file pruning. Route partitioned tables through
        # append() (which lays files out per spec) instead.
        raise ValueError("copy_into targets unpartitioned tables only")
    table_cols = [f.name for f in table.schema().fields]
    want = expected_columns or table_cols
    commit_id = f"copy-{uuid.uuid4().hex[:12]}"
    rel_dir = os.path.join("data", commit_id)
    out_dir = os.path.join(table.path, rel_dir)
    os.makedirs(out_dir, exist_ok=True)
    entries: list[FileEntry] = []
    moved: list[tuple[str, str]] = []
    try:
        for src in staged:
            rows, size, stats = _collect_parquet_stats(src, stat_cols or [])
            if rows == 0:
                continue
            import pyarrow.parquet as pq

            file_cols = [c for c in pq.read_schema(src).names]
            if [c for c in file_cols if c in want] != want:
                raise ValueError(
                    f"staged file {os.path.basename(src)} columns {file_cols} "
                    f"do not cover table schema {want}"
                )
            dst = os.path.join(out_dir, os.path.basename(src))
            shutil.move(src, dst)
            moved.append((src, dst))
            entries.append(
                FileEntry(
                    os.path.relpath(dst, table.path), rows, size, sid, {}, stats
                )
            )
        if not entries:
            return m["version"]
        return table.commit(
            entries,
            operation="copy_into",
            checkpoint_key=checkpoint_key,
            summary={"staging_dir": staging_dir, "objects": len(entries)},
        )
    except Exception:
        # un-move so a failed copy leaves the staging prefix intact
        for src, dst in moved:
            if os.path.exists(dst):
                shutil.move(dst, src)
        raise
