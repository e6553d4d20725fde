"""Transaction-boundary-aware CDC apply: never split a source transaction.

Debezium publishes per-event transaction metadata (id, total event count)
and a BEGIN/END boundary stream precisely so consumers can apply change
events atomically per source transaction (reference consumes the raw
envelope in DebeziumEventUtils; the transaction block is part of the same
envelope contract). A micro-batch boundary that lands mid-transaction
would otherwise publish a state no source transaction ever produced —
e.g. an order row without its order_lines.

Spark-native restatement: given a changelog whose events carry
``(tx_id, tx_total)`` (id + declared event count — what the Debezium
transaction block provides), a transaction is COMPLETE at log position P
when all ``tx_total`` of its events have lsn ≤ P. `split_transactions`
partitions a batch into (ready, deferred) in one group-by pass;
`replay_transactional` re-buckets a whole changelog so every event is
applied in the commit where its transaction completes — transactions
spanning segment boundaries ride forward, never split.

Scale shape (100 TB): completion detection is one aggregate keyed on
tx_id (map-side combinable counts) + a semi-join back — both shuffle
O(events in flight), not O(table); the per-segment re-bucketing reuses
the same pass. Deferred events are bounded by open-transaction volume
(the same bound any transactional consumer must hold).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def complete_tx_ids(
    changelog: DataFrame,
    upto_lsn: int | None = None,
    tx_col: str = "tx_id",
    total_col: str = "tx_total",
    lsn_col: str = "_ab_cdc_lsn",
) -> DataFrame:
    """Transactions fully contained in the log prefix lsn ≤ upto_lsn
    (whole input if None): observed event count equals the declared
    total. Returns (tx_id, tx_end_lsn)."""
    df = changelog if upto_lsn is None else changelog.filter(F.col(lsn_col) <= upto_lsn)
    return (
        df.groupBy(tx_col)
        .agg(
            F.count(F.lit(1)).alias("_seen"),
            F.max(total_col).alias("_total"),
            F.max(lsn_col).alias("tx_end_lsn"),
        )
        .filter(F.col("_seen") == F.col("_total"))
        .select(tx_col, "tx_end_lsn")
    )


def split_transactions(
    batch: DataFrame,
    tx_col: str = "tx_id",
    total_col: str = "tx_total",
    lsn_col: str = "_ab_cdc_lsn",
) -> tuple[DataFrame, DataFrame]:
    """(ready, deferred): events whose transaction is complete within this
    batch vs events that must ride to a later batch. Deterministic and
    side-effect-free — callers union `deferred` into the next batch."""
    done = complete_tx_ids(batch, None, tx_col, total_col, lsn_col).select(tx_col)
    ready = batch.join(done, tx_col, "left_semi")
    deferred = batch.join(done, tx_col, "left_anti")
    return ready, deferred


def replay_transactional(
    pipe,
    changelog: DataFrame,
    tx_col: str = "tx_id",
    total_col: str = "tx_total",
    lsn_col: str = "_ab_cdc_lsn",
    checkpoint_col: str = "checkpoint_id",
) -> list:
    """Replay a changelog at segment granularity with transaction-atomic
    commits: every event is applied in the segment where its transaction
    COMPLETES (the segment of the transaction's last event), so no commit
    ever publishes a torn transaction. Events of transactions that never
    complete in the input (still open at the log head) are withheld —
    exactly what a transactional consumer must do.

    One planning pass computes each transaction's completion segment; the
    replay then proceeds segment-by-segment through the pipeline's normal
    idempotent commit path (checkpoint keys ``txn-{segment}``)."""
    done = complete_tx_ids(changelog, None, tx_col, total_col, lsn_col)
    # completion segment = segment of the transaction's last event
    seg_of_end = done.join(
        changelog.select(tx_col, F.col(lsn_col).alias("tx_end_lsn"),
                         F.col(checkpoint_col).alias("_apply_seg")),
        [tx_col, "tx_end_lsn"],
    ).select(tx_col, "_apply_seg")
    bucketed = changelog.join(seg_of_end, tx_col)  # open txs drop out (inner)
    segs = sorted(
        r[0] for r in bucketed.select("_apply_seg").distinct().collect()
    )
    results = []
    for s in segs:
        batch = bucketed.filter(F.col("_apply_seg") == s).drop("_apply_seg")
        results.append(pipe.apply_batch(batch, f"txn-{s}"))
    return results
