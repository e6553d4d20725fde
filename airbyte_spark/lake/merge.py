"""MERGE INTO for LakeTable — copy-on-write upsert with LWW + tombstones.

Semantics (≡ the reference's SCD active-row rules, base-normalization
stream_processor.py:695-768, and the destination acceptance contract
"keep only the latest-emitted record per composite PK",
DestinationAcceptanceTest.java:612-637):

  WHEN MATCHED AND source newer AND source.deleted  THEN DELETE
  WHEN MATCHED AND source newer                     THEN UPDATE (payload+lsn)
  WHEN MATCHED AND source older/equal               THEN no-op (late event)
  WHEN NOT MATCHED AND NOT source.deleted           THEN INSERT

"newer" is the lexicographic order (cursor, lsn...) — a total order, so
replay is deterministic even under exact cursor ties (reference tiebreaker
chain cursor→emitted_at→cdc_updated_at→log_pos).

Scale shape (the part that must survive 100 TB / 1000 executors):
  1. the batch is deduped to one row per key (one shuffle on url);
  2. candidate-file pruning happens at the driver from manifest metadata:
     only files in buckets the batch's keys hash to, whose [min,max] key
     range overlaps the batch, are read and rewritten — the rest of the
     table is untouched (copy-on-write with file-level skipping, the same
     plan Iceberg's MERGE executes);
  3. existing⋈batch is an equi-join on the key; with AQE on, a small batch
     side auto-broadcasts and skewed keys are split (plus the bucket
     layout spreads hot domains across url-hash buckets by construction).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from airbyte_spark.lake.format import FileEntry, LakeTable
from airbyte_spark.protocol import StreamConfig
from airbyte_spark.schema import TARGET_META_COLS

_ENVELOPE = {"_ab_cdc_updated_at", "_ab_cdc_deleted_at", "_emitted_at", "checkpoint_id"}


@dataclass
class MergeStats:
    version: int
    candidate_files: int
    skipped: bool = False


def payload_columns(batch: DataFrame) -> list[str]:
    """Target-table columns carried by a change batch: everything except the
    CDC envelope; _ab_cdc_lsn is kept (stored in the target for total-order
    ties on replay)."""
    return [c for c in batch.columns if c not in _ENVELOPE]


def _prune_candidates(
    table: LakeTable, batch_bounds: dict[int, tuple[str, str]], key_col: str
) -> list[FileEntry]:
    """Driver-side file skipping: bucket containment + key-range overlap."""
    spec = table.partition_spec()
    bucket_fields = [f for f in spec.fields if f.transform == "bucket" and f.source == key_col]
    out = []
    for e in table.files():
        if bucket_fields:
            b = e.partition.get(bucket_fields[0].name)
            if b is not None and int(b) not in batch_bounds:
                continue
            lo_hi = batch_bounds.get(int(b)) if b is not None else None
        else:
            lo_hi = _merge_bounds(batch_bounds)
        st = e.stats.get(key_col)
        if st is not None and lo_hi is not None:
            if st["max"] < lo_hi[0] or st["min"] > lo_hi[1]:
                continue
        out.append(e)
    return out


def _merge_bounds(bounds: dict[int, tuple[str, str]]) -> tuple[str, str] | None:
    if not bounds:
        return None
    los, his = zip(*bounds.values())
    return min(los), max(his)


def merge_upsert(
    table: LakeTable,
    batch: DataFrame,
    cfg: StreamConfig,
    checkpoint_key: str | None = None,
) -> MergeStats:
    """Apply one deduped change batch to the target table.

    `batch` must contain at most one row per primary key (run
    operators.dedup.dedup_batch first — the pipeline does).
    Idempotent when checkpoint_key is supplied: a replayed batch whose key
    is already in the manifest's committed set is skipped before any work.
    """
    if checkpoint_key is not None and checkpoint_key in table.committed():
        return MergeStats(version=table.current_version(), candidate_files=0, skipped=True)

    key = cfg.primary_key[0] if len(cfg.primary_key) == 1 else None
    if key is None:
        raise NotImplementedError("composite PKs: concat into a single key column first")

    # Evolve target schema if the batch carries new/widened payload columns.
    batch_payload = batch.select(*payload_columns(batch))
    table.evolve_schema(batch_payload.schema)
    target_schema = table.schema()

    spec = table.partition_spec()
    bucket_fields = [f for f in spec.fields if f.transform == "bucket" and f.source == key]

    # Per-bucket [min,max] key bounds of the batch — tiny driver-side
    # metadata (≤ n_buckets rows), the only collect in the merge.
    if bucket_fields:
        bexpr = bucket_fields[0].expr()
        bounds_rows = (
            batch.groupBy(bexpr.alias("b")).agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
        ).collect()
        bounds = {int(r["b"]): (r["lo"], r["hi"]) for r in bounds_rows}
    else:
        r = batch.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).collect()[0]
        bounds = {0: (r["lo"], r["hi"])} if r["lo"] is not None else {}

    candidates = _prune_candidates(table, bounds, key)
    existing = table.read(files=candidates)

    merged = resolve_merge(existing, batch, cfg, target_schema.fieldNames())

    entries = table._stage_write(merged, stat_cols=[key], one_file_per_partition=True)
    rows_removed = sum(e.rows for e in candidates)
    version = table.commit(
        entries,
        removed_paths={e.path for e in candidates},
        operation="merge",
        checkpoint_key=checkpoint_key,
        summary={"rows_removed": rows_removed, "candidate_files": len(candidates)},
    )
    return MergeStats(version=version, candidate_files=len(candidates))


def resolve_merge(
    existing: DataFrame,
    batch: DataFrame,
    cfg: StreamConfig,
    out_cols: list[str],
) -> DataFrame:
    """Pure DataFrame restatement of the MERGE cases (unit-testable without
    a table). Both inputs keyed by cfg.primary_key; batch has ≤1 row/key."""
    key = cfg.primary_key[0]
    order_cols = cfg.order_cols  # e.g. [warc_ts, _ab_cdc_lsn]

    e = existing.withColumn("_e_exists", F.lit(True)).alias("e")
    b = batch.withColumn("_b_exists", F.lit(True)).alias("b")

    joined = e.join(b, F.col(f"e.{key}") == F.col(f"b.{key}"), "full_outer")

    e_exists = F.col("e._e_exists").isNotNull()
    b_exists = F.col("b._b_exists").isNotNull()
    b_newer = F.struct(*[F.col(f"b.{c}") for c in order_cols]) >= F.struct(
        *[F.col(f"e.{c}") for c in order_cols]
    )
    b_wins = b_exists & (~e_exists | b_newer)
    b_deleted = F.col(f"b.{cfg.deleted_at_field}").isNotNull()

    kept = joined.filter(~(b_wins & b_deleted))
    out = kept.select(
        *[
            F.when(b_wins, F.col(f"b.{c}")).otherwise(F.col(f"e.{c}")).alias(c)
            if c in batch.columns
            else F.col(f"e.{c}").alias(c)
            for c in out_cols
        ]
    )
    return out


def target_projection(batch: DataFrame, cfg: StreamConfig) -> DataFrame:
    """Project a change batch onto target-table columns (payload + lsn)."""
    cols = payload_columns(batch)
    ordered = [c for c in cols if c not in TARGET_META_COLS] + [
        c for c in TARGET_META_COLS if c in cols
    ]
    return batch.select(*ordered)
