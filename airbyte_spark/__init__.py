"""airbyte_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the query & data-processing capabilities of the reference
ELT/CDC platform (Marketparts/airbyte, surveyed in /root/repo/SURVEY.md)
as an idiomatic Spark engine:

- change streams (binlog/WAL-style) of Common-Crawl-shaped web-page records
- per-micro-batch window dedup (row_number over url, latest-writer-wins)
- MERGE upserts (insert/update/delete tombstones) into an ACID lake table
  format built from scratch on parquet + an atomic JSON snapshot log
  (no Iceberg/Delta jars exist in this environment)
- cursor state, checkpoints keyed by (checkpoint_id, partition),
  idempotent commits, replay-from-checkpoint resumability
- schema evolution (add column / widen type) via catalog diff
- vectorized Arrow/pandas UDF text extraction (byte-identical per url)

Everything is DataFrame-first: Catalyst handles pruning/pushdown; the only
Python-side loops are driver-side metadata (snapshot manifests).
"""

from airbyte_spark.protocol import (  # noqa: F401
    DestinationSyncMode,
    StreamConfig,
    SyncMode,
)
from airbyte_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
