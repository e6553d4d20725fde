"""Stream / sync configuration model.

Spark-native restatement of the reference's protocol objects
(`airbyte-protocol/models/.../airbyte_protocol.yaml:122-210` —
AirbyteStream, ConfiguredAirbyteStream, SyncMode, DestinationSyncMode).
There is no JSON-schema indirection here: schemas are StructTypes and a
"configured stream" is a plain dataclass the pipeline consumes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql.types import StructType


class SyncMode(str, Enum):
    """airbyte_protocol.yaml:199-203."""

    FULL_REFRESH = "full_refresh"
    INCREMENTAL = "incremental"


class DestinationSyncMode(str, Enum):
    """airbyte_protocol.yaml:204-210 (append_dedup == SCD type 1 active rows)."""

    APPEND = "append"
    OVERWRITE = "overwrite"
    APPEND_DEDUP = "append_dedup"


@dataclass
class StreamConfig:
    """≡ ConfiguredAirbyteStream (airbyte_protocol.yaml:171-198).

    primary_key: dedup/merge key columns (reference: composite PK list).
    cursor_field: incremental ordering column (reference: cursor_field).
    order_tiebreakers: total-order suffix after the cursor, mirroring the
      reference's window ordering chain cursor DESC → _airbyte_emitted_at
      DESC → _ab_cdc_updated_at DESC → _ab_cdc_log_pos DESC
      (base-normalization stream_processor.py:695-709).
    """

    name: str
    schema: StructType
    sync_mode: SyncMode = SyncMode.INCREMENTAL
    destination_sync_mode: DestinationSyncMode = DestinationSyncMode.APPEND_DEDUP
    primary_key: list[str] = field(default_factory=lambda: ["url"])
    cursor_field: str = "warc_ts"
    order_tiebreakers: list[str] = field(default_factory=lambda: ["_ab_cdc_lsn"])
    deleted_at_field: str = "_ab_cdc_deleted_at"

    @property
    def order_cols(self) -> list[str]:
        return [self.cursor_field, *self.order_tiebreakers]
