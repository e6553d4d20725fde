"""Cross-batch stateful operators via applyInPandasWithState.

The reference skips redelivered change events by comparing each event's
position to the per-stream offset it last committed
(`DebeziumRecordIterator.java:102-125` bounded-by-target-position read;
`docs/understanding-airbyte/cdc.md:15-20` `_ab_cdc_lsn` resume semantics).
That is a sequential, single-consumer design. The Spark-native restatement
keeps a per-KEY high-water mark as distributed streaming state: rows whose
lsn is at or below their key's recorded mark are dropped, everything else
passes and advances the mark. State lives in the streaming state store,
partitioned by the grouping key — the same hash partitioning as the merge
shuffle — so 10^10 keys spread across executors instead of one consumer's
offset map.

This is the record-level at-least-once → effectively-once guard for sinks
that lack the lake table's transactional committed-checkpoint set (raw
append sinks, side outputs). The lake merge path does NOT need it: its
idempotence comes from the manifest commit protocol.

Implementation: `applyInPandasWithState` (Arrow-batched pandas per group —
no per-row Python), one state row per key holding a single int64. Within a
micro-batch, rows are screened in arrival order against the running mark,
matching the reference's iterator semantics (an out-of-order older event
inside the same poll window is dropped the same way).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

_STATE_SCHEMA = StructType([StructField("max_lsn", LongType(), True)])


def redelivery_filter(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    lsn_col: str = "_ab_cdc_lsn",
) -> DataFrame:
    """Drop rows whose `lsn_col` does not exceed their key's high-water mark.

    Works on a streaming DataFrame (state persists across micro-batches in
    the state store). Emits rows in arrival order; the mark advances as
    rows pass, so an exact redelivery of a prior batch yields zero rows.
    """
    key_cols = key_cols or ["url"]
    out_schema = stream.schema

    def screen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mark = state.get[0] if state.exists else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            lsn = pdf[lsn_col]
            # running mark before each row = max(stored mark, cummax of the
            # rows above it) — all vectorized, no per-row Python
            prev = lsn.cummax().shift(1)
            if mark is not None:
                prev = prev.fillna(mark).clip(lower=mark)
            keep = prev.isna() | (lsn > prev)
            mark = int(lsn.max()) if mark is None else max(mark, int(lsn.max()))
            out = pdf[keep]
            if len(out):
                yield out
        if mark is not None:
            state.update((int(mark),))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        screen,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TX_STATE_SCHEMA = StructType(
    [
        StructField("total", LongType(), True),
        StructField("buf", BinaryType(), True),
    ]
)


def tx_assembler(
    stream: DataFrame,
    tx_col: str = "tx_id",
    total_col: str = "tx_total",
) -> DataFrame:
    """Streaming transaction assembly: buffer each transaction's events in
    the state store until all `tx_total` of them have arrived, then emit
    the WHOLE transaction in one micro-batch output — the streaming
    counterpart of sources/transactions.split_transactions, and the
    Debezium transaction-metadata consumption pattern (buffer-until-END)
    restated as distributed streaming state.

    State is keyed on tx_id (hash-partitioned across executors like any
    other shuffle key), so open-transaction buffering scales with the
    number of IN-FLIGHT transactions, not the stream: a transaction's
    events stay in state exactly until its last event arrives. Incomplete
    transactions are withheld indefinitely — the same contract as any
    transactional consumer; evict abandoned ones by redeploying with a
    lower watermark upstream (a GroupStateTimeout eviction hook is the
    production knob, omitted so replay tests stay deterministic).

    Pending events are serialized into the state value as parquet bytes —
    Arrow-batched both ways, no per-row Python."""
    import io

    out_schema = stream.schema

    def assemble(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if state.exists:
            total, buf = state.get
            if buf is not None:
                chunks.insert(0, pd.read_parquet(io.BytesIO(bytes(buf))))
        else:
            total = None
        if not chunks:
            return
        allp = pd.concat(chunks, ignore_index=True)
        declared = allp[total_col].max()
        total = int(declared) if total is None else int(max(total, declared))
        if len(allp) >= total:
            state.remove()
            yield allp
        else:
            sink = io.BytesIO()
            allp.to_parquet(sink, index=False)
            state.update((total, sink.getvalue()))

    return stream.groupBy(tx_col).applyInPandasWithState(
        assemble,
        outputStructType=out_schema,
        stateStructType=_TX_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
