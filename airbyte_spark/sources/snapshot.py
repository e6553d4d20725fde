"""Chunked incremental snapshot: bootstrap a target while the stream flows.

The reference bootstraps a CDC stream with a full snapshot FOLLOWED by the
log tail (docs/understanding-airbyte/cdc.md:15-20 "initial sync then
incremental"; the Debezium engine's snapshot mode), which means a 100 TB
source is read-locked-for-days before the first change event applies. The
scale-true alternative is the chunked incremental snapshot of DBLog
(Andreadis et al., "DBLog: A Watermark Based Change-Data-Capture
Framework", 2019 — the algorithm Debezium ships as its incremental
snapshot, design DDD-3): split the key space into chunks, read each chunk
at a known log position while the change stream keeps being consumed, and
let a per-chunk watermark window decide which snapshot rows are stale (a
change event for the same key inside the window supersedes the chunk row).

Two regimes, both implemented:

* ``discard_in_window=True`` — DBLog-faithful. Snapshot rows carry no
  event coordinates (a plain SELECT of a foreign table); a chunk row is
  DISCARDED when any stream event for its key lands in ``(lw, hw]``;
  survivors compete at position ``lw``. Correct under position ordering
  (the log's own order = lsn): every event at or below ``lw`` is already
  folded into the chunk row, every event above ``hw`` outranks it, and
  in-window events kill it.

* ``discard_in_window=False`` — lake-to-lake bootstrap. When the snapshot
  source is one of OUR lake tables (re-shard, new replica, disaster
  recovery), every row already carries its winning event's
  ``(cursor, lsn)`` coordinates AND soft-delete tombstones are retained,
  so the union resolves under the engine's full total order
  ``(warc_ts, lsn)`` with no discard pass — late, out-of-order cursor
  values included. This is the mode the gated query
  (``cdc_incremental_snapshot``) exercises.

Both converge to the same final state as replaying the entire log from
LSN 0 — that equivalence IS the oracle.

Scale shape (100 TB): chunk reads are independent, each one merge commit
of O(chunk) rows (idempotent under checkpoint key ``snap-{c}``),
interleaved with ordinary segment commits — no global quiesce, no
table-wide barrier, no unbounded snapshot-vs-stream buffer; chunk → key
routing is a hash of the merge key, so chunk batches land on the same
bucket layout the merge shuffle uses. The whole interleave is
LWW-convergent, so a crashed bootstrap resumes by re-running it: committed
chunks and segments skip via the manifest's committed-checkpoint set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from airbyte_spark.protocol import StreamConfig


def _chunk_expr(pk_cols: list[str], n_chunks: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in pk_cols]), F.lit(n_chunks))


def snapshot_chunks(
    changelog: DataFrame,
    cfg: StreamConfig,
    snapshot_lsn: int,
    chunk_step: int,
    n_chunks: int = 8,
    keep_tombstones: bool = True,
    position_only: bool = False,
) -> DataFrame:
    """Simulate chunked reads of a source table that keeps applying the log
    while the snapshot runs: chunk ``c`` (keys with ``hash % n_chunks == c``)
    is read at log position ``lw(c) = snapshot_lsn + c*chunk_step``, so its
    rows are the per-key winners among events with ``lsn <= lw(c)``.

    ``keep_tombstones=True`` models a lake-table source (soft-deleted rows
    visible to the replicator); ``False`` models a foreign table (deleted
    keys simply absent). ``position_only=True`` picks winners by log
    position alone (how a foreign table actually applies its log);
    ``False`` uses the engine's full total order (cursor, then
    tiebreakers). Output carries ``_chunk``, ``_lw`` and ``_hw`` columns.

    One shuffle (window on the merge key); at scale each chunk is its own
    bounded read, issued as the log reaches its watermark.
    """
    pk = cfg.primary_key
    lsn_col = cfg.order_tiebreakers[-1]
    lw = (F.lit(snapshot_lsn) + _chunk_expr(pk, n_chunks) * F.lit(chunk_step)).cast("long")
    if position_only:
        order = [F.col(lsn_col).desc_nulls_last()]
    else:
        order = [F.col(c).desc_nulls_last() for c in cfg.order_cols]
    w = Window.partitionBy(*pk).orderBy(*order)
    out = (
        changelog.withColumn("_lw", lw)
        .filter(F.col(lsn_col) <= F.col("_lw"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_chunk", _chunk_expr(pk, n_chunks))
        .withColumn("_hw", (F.col("_lw") + F.lit(chunk_step)).cast("long"))
    )
    if not keep_tombstones:
        out = out.filter(F.col(cfg.deleted_at_field).isNull())
    return out


def interleaved_state(
    snapshot_rows: DataFrame,
    stream: DataFrame,
    cfg: StreamConfig,
    discard_in_window: bool = False,
) -> DataFrame:
    """Resolve chunked snapshot ∪ live stream to the final active rows.

    ``discard_in_window=True`` is the DBLog watermark rule: chunk rows
    whose key saw a stream event inside ``(lw, hw]`` are dropped (the
    event is fresher than the chunk read), survivors are ranked at
    position ``lw`` with events winning position ties; ordering is by log
    position alone. ``False`` trusts the snapshot rows' own
    ``(cursor, lsn)`` coordinates (lake-to-lake mode) and applies the
    engine's standard LWW total order; tombstone rows in the snapshot keep
    late out-of-order events from resurrecting deleted keys, exactly as in
    the merge path (lake/merge.py resolve window).

    Plan shape: one broadcast-or-shuffle anti-join (discard mode only) +
    one window over the union, partitioned on the merge key — the same
    single-shuffle shape as ``resolve_merge``.
    """
    pk = cfg.primary_key
    lsn_col = cfg.order_tiebreakers[-1]
    if discard_in_window:
        in_window = (
            stream.join(snapshot_rows.select(*pk, "_lw", "_hw"), pk)
            .filter((F.col(lsn_col) > F.col("_lw")) & (F.col(lsn_col) <= F.col("_hw")))
            .select(*pk)
            .distinct()
        )
        snapshot_rows = snapshot_rows.join(in_window, pk, "left_anti")
        snap = snapshot_rows.withColumn("_pos", F.col("_lw")).withColumn(
            "_is_event", F.lit(0)
        )
        ev = stream.withColumn("_pos", F.col(lsn_col).cast("long")).withColumn(
            "_is_event", F.lit(1)
        )
        order = [F.col("_pos").desc_nulls_last(), F.col("_is_event").desc()]
    else:
        snap = snapshot_rows.withColumn("_is_event", F.lit(0))
        ev = stream.withColumn("_is_event", F.lit(1))
        order = [F.col(c).desc_nulls_last() for c in cfg.order_cols] + [
            F.col("_is_event").desc()
        ]
    unioned = ev.unionByName(snap, allowMissingColumns=True)
    w = Window.partitionBy(*pk).orderBy(*order)
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & F.col(cfg.deleted_at_field).isNull())
        .drop("_rn", "_pos", "_is_event", "_lw", "_hw", "_chunk")
    )


def bootstrap_pipeline(
    pipe,
    changelog: DataFrame,
    snapshot_lsn: int,
    chunk_step: int,
    n_chunks: int = 8,
    batch_span: int = 1_000,
) -> list:
    """End-to-end chunked bootstrap of a real LakeTable: interleave chunk
    commits (checkpoint key ``snap-{c}``) with ordinary segment replay, in
    watermark order — chunk ``c`` commits right after the log reaches
    ``lw(c)``. Every commit is idempotent, so a crashed bootstrap re-runs
    to completion, skipping whatever already landed (same guarantee as
    ``CdcPipeline.replay``). Returns the list of BatchResults.

    Final state provably equals a from-LSN-0 replay: chunks partition the
    key space and each chunk row is the LWW winner at its watermark, so the
    union of (chunks, segments past the snapshot base) covers every key's
    winning event; the merge window resolves the rest.
    """
    results = []
    helper_cols = ["_lw", "_hw", "_chunk"]
    lsn_col = pipe.cfg.order_tiebreakers[-1]
    snap = snapshot_chunks(
        changelog, pipe.cfg, snapshot_lsn, chunk_step, n_chunks,
        keep_tombstones=True,
    )
    # the chunk plan is a window over the WHOLE changelog; without a
    # persist each chunk's filter (and each merge's double evaluation)
    # would re-scan and re-sort the full log ~2x per chunk
    snap = snap.persist()
    first_seg = snapshot_lsn // batch_span
    for c in range(n_chunks):
        lw = snapshot_lsn + c * chunk_step
        # drain segments the log produced before this chunk's watermark
        upto = lw // batch_span
        seg_slice = changelog.filter(
            (F.col("checkpoint_id") >= first_seg) & (F.col("checkpoint_id") <= upto)
        )
        results += pipe.replay(seg_slice, group_size=max(1, upto - first_seg + 1))
        chunk_batch = snap.filter(F.col("_chunk") == c).drop(*helper_cols)
        results.append(pipe.apply_batch(chunk_batch, f"snap-{c}"))
    # snapshot finished — drain the remaining log
    results += pipe.replay(changelog.filter(F.col("checkpoint_id") >= first_seg))
    snap.unpersist()
    return results
