"""Multi-stream sync catalog — the engine's ConfiguredAirbyteCatalog.

≡ the reference's unit of work: a catalog of many streams, each with its
own sync mode, destination mode, cursor and primary key
(airbyte_protocol.yaml:160-198 ConfiguredAirbyteCatalog/Stream;
CatalogHelpers.java:64-79 toDefaultConfiguredCatalog), consumed by a
destination that routes records per stream
(BufferedStreamConsumer.java:166-174 groups buffered records by stream).

Here each stream pairs a StreamConfig with a Source callable and a target
lake table; `sync` runs every stream per its modes and returns per-stream
results. Streams are independent tables — state (the committed-checkpoint
set) lives per-stream in each table's manifest, exactly like the
reference's per-stream state map (StateManager.java:154-195).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from airbyte_spark.lake.format import LakeTable, PartitionSpec
from airbyte_spark.operators.dedup import dedup_batch
from airbyte_spark.protocol import DestinationSyncMode, StreamConfig, SyncMode
from airbyte_spark.sources.registry import Source
from airbyte_spark.streaming.pipeline import CdcPipeline


@dataclass
class ConfiguredStream:
    cfg: StreamConfig
    source: Source
    target_path: str
    n_buckets: int = 16
    extract: bool = True


@dataclass
class SyncCatalog:
    streams: list[ConfiguredStream] = field(default_factory=list)

    def discover(self) -> dict:
        """≡ the `discover` command's AirbyteCatalog output
        (entrypoint.py:92-94; AbstractDbSource.java:78-90)."""
        return {
            "streams": [
                {
                    "name": s.cfg.name,
                    "json_schema": {
                        "fields": [
                            {"name": f.name, "type": f.dataType.simpleString()}
                            for f in s.cfg.schema.fields
                        ]
                    },
                    "supported_sync_modes": [m.value for m in SyncMode],
                    "default_cursor_field": [s.cfg.cursor_field],
                    "source_defined_primary_key": [[k] for k in s.cfg.primary_key],
                    "sync_mode": s.cfg.sync_mode.value,
                    "destination_sync_mode": s.cfg.destination_sync_mode.value,
                }
                for s in self.streams
            ]
        }


def _pipeline_for(
    spark: SparkSession, s: ConfiguredStream, table: LakeTable | None = None
) -> CdcPipeline:
    if table is None:
        table = _ensure_table(spark, s)
    return CdcPipeline(table=table, cfg=s.cfg, extract=s.extract)


def _ensure_table(spark: SparkSession, s: ConfiguredStream) -> LakeTable:
    if LakeTable.exists(s.target_path):
        return LakeTable.load(spark, s.target_path)
    return LakeTable.create(
        spark,
        s.target_path,
        s.cfg.schema,
        PartitionSpec.bucket(s.cfg.primary_key[0], s.n_buckets),
    )


def sync_stream(
    spark: SparkSession,
    s: ConfiguredStream,
    state: dict | None = None,
    table: LakeTable | None = None,
) -> dict:
    """Run one stream per its configured modes; returns a sync summary.
    `table` overrides the target handle — atomic catalog sync passes a WAP
    branch handle here so every commit stages invisibly until publish."""
    state = state or {}
    df = s.source(spark, state)
    mode, dmode = s.cfg.sync_mode, s.cfg.destination_sync_mode

    if dmode == DestinationSyncMode.OVERWRITE or mode == SyncMode.FULL_REFRESH:
        # full snapshot: window-dedup to active rows, atomic overwrite
        # (≡ transactional TRUNCATE+INSERT swap, JdbcBufferedConsumerFactory)
        pipe = _pipeline_for(spark, s, table)
        snap = dedup_batch(df, s.cfg)
        if s.cfg.deleted_at_field in snap.columns:
            snap = snap.filter(F.col(s.cfg.deleted_at_field).isNull())
        from airbyte_spark.lake.format import _align
        from airbyte_spark.lake.merge import target_projection

        pipe.table.overwrite(
            _align(target_projection(snap, s.cfg), pipe.table.schema()),
            stat_cols=[s.cfg.primary_key[0]],
        )
        return {"stream": s.cfg.name, "mode": "overwrite", "rows": pipe.table.read().count()}

    if dmode == DestinationSyncMode.APPEND:
        pipe = _pipeline_for(spark, s, table)
        # manifest row totals before/after (parquet-footer metadata, no
        # data read) give the appended count — 0 on an already-committed
        # checkpoint replay, so attempt records stay truthful
        before = sum(f.rows for f in pipe.table.files())
        v = pipe.table.append(
            _align_append(df, pipe.table),
            checkpoint_key=f"append-{state.get('from_checkpoint', 0)}",
        )
        rows = sum(f.rows for f in pipe.table.files()) - before
        return {
            "stream": s.cfg.name, "mode": "append", "version": v, "rows": rows,
        }

    # incremental + append_dedup: checkpointed CDC replay
    pipe = _pipeline_for(spark, s, table)
    results = pipe.replay(df, from_checkpoint=state.get("from_checkpoint"))
    return {
        "stream": s.cfg.name,
        "mode": "append_dedup",
        "applied": sum(1 for r in results if not r.skipped),
        "skipped": sum(1 for r in results if r.skipped),
        "rows": sum(r.rows_in or 0 for r in results if not r.skipped),
        "committed": pipe.committed_checkpoints(),
    }


def _align_append(df, table):
    from airbyte_spark.lake.format import _align

    table.evolve_schema(df.schema)
    return _align(df, table.schema())


def sync(
    spark: SparkSession,
    catalog: SyncCatalog,
    state: dict | None = None,
    atomic: bool = False,
    txn_log_dir: str | None = None,
) -> list[dict]:
    """Sync every stream in the catalog (per-stream state under its name).

    Default: streams commit independently — separate target tables, no
    commit contention; on a cluster they can run concurrently. This is the
    reference's behavior, and its known gap: between stream flushes a
    reader sees stream A's new data next to stream B's old data
    (BufferedStreamConsumer flushes per-stream buffers independently).

    `atomic=True` closes the gap with a catalog-level multi-table
    transaction (lake/transaction.py): every stream's whole sync — any
    mode, any number of checkpointed commits — stages on a `txn-*` WAP
    branch of its table, then ONE logged decision publishes all streams
    or none. A mid-sync failure aborts with every main table untouched;
    a crash after the decision is rolled forward by recover(). Readers
    pinning `consistent_versions(txn_log_dir)` always see a catalog state
    some transaction produced, never a mix."""
    import os as _os

    state = state or {}
    if not atomic or not catalog.streams:
        return [sync_stream(spark, s, state.get(s.cfg.name)) for s in catalog.streams]

    from airbyte_spark.lake.transaction import CatalogTransaction

    for s in catalog.streams:
        _ensure_table(spark, s)  # table creation is not transactional; empty is harmless
    log_dir = txn_log_dir or _os.path.join(
        _os.path.dirname(_os.path.abspath(catalog.streams[0].target_path)), "_txn_log"
    )
    txn = CatalogTransaction.begin(
        spark, log_dir, {s.cfg.name: s.target_path for s in catalog.streams}
    )
    try:
        results = [
            sync_stream(spark, s, state.get(s.cfg.name), table=txn.table(s.cfg.name))
            for s in catalog.streams
        ]
    except BaseException:
        txn.abort()
        raise
    versions = txn.commit()
    for r in results:
        r["published_version"] = versions.get(r["stream"])
    return results


def apply_namespace_mapping(
    catalog: SyncCatalog,
    prefix: str = "",
    namespace_format: str = "${SOURCE_NAMESPACE}",
    source_namespace: str = "",
) -> SyncCatalog:
    """Stream-prefix / namespace rewrite between source and destination —
    ≡ the reference's NamespacingMapper (airbyte-workers
    NamespacingMapper.java:25-80: prefixes stream names and resolves the
    destination namespace from a ${SOURCE_NAMESPACE} template). Returns a
    NEW catalog whose stream names and target paths carry the mapping;
    sources and schemas are untouched."""
    ns = namespace_format.replace("${SOURCE_NAMESPACE}", source_namespace)
    out = []
    for s in catalog.streams:
        from dataclasses import replace

        name = f"{prefix}{s.cfg.name}"
        cfg = replace(s.cfg, name=name)
        head, _, tail = s.target_path.rpartition("/")
        target = "/".join(x for x in (head, ns, f"{prefix}{tail}") if x)
        out.append(replace(s, cfg=cfg, target_path=target))
    return SyncCatalog(out)


def post_sync_sql(spark: SparkSession, stream: ConfiguredStream, sql: str):
    """Custom SQL stage after a sync — ≡ the reference's operator-supplied
    dbt transformation step (SyncWorkflowImpl.java:77-82: user SQL models
    run against the destination after normalization). The stream's active
    rows are registered as a temp view named after the stream; the user
    query runs against it and returns a DataFrame."""
    pipe = _pipeline_for(spark, stream)
    pipe.final_state().createOrReplaceTempView(stream.cfg.name)
    return spark.sql(sql)


# jsonschema for one catalog stream entry (the per-stream analogue of the
# CLI spec's connectionSpecification; validated in catalog_from_json)
STREAM_ENTRY_SPEC = {
    "type": "object",
    "required": ["name", "schema_ddl", "source", "target"],
    "properties": {
        "name": {"type": "string"},
        "schema_ddl": {"type": "string"},
        "source": {"type": "object"},
        "target": {"type": "string"},
        "sync_mode": {"type": "string", "enum": ["full_refresh", "incremental"]},
        "destination_sync_mode": {
            "type": "string",
            "enum": ["overwrite", "append", "append_dedup"],
        },
        "primary_key": {"type": "array"},
        "cursor_field": {"type": "string"},
        "n_buckets": {"type": "integer"},
        "extract": {"type": "boolean"},
    },
}


def catalog_from_json(doc: dict) -> SyncCatalog:
    """Build a SyncCatalog from a JSON document (the CLI's --catalog file)
    — ≡ the user-configured ConfiguredAirbyteCatalog the reference ships to
    every sync. Shape:

    {"streams": [{
        "name": "pages",
        "schema_ddl": "url string, warc_ts timestamp_ntz, ...",   # target cols
        "source": {"type": "mapped_parquet", "args": {...}},      # registry name
        "target": "/lake/pages",
        "sync_mode": "incremental",
        "destination_sync_mode": "append_dedup",
        "primary_key": ["url"],
        "cursor_field": "warc_ts",
        "n_buckets": 16
    }]}
    """
    from pyspark.sql.types import StructType

    from airbyte_spark.functions.jsonschema import check_config_against_spec
    from airbyte_spark.sources.registry import source_factory

    streams = []
    for s in doc["streams"]:
        # ≡ the cdk's check_config_against_spec_or_exit (connector.py):
        # reject a malformed stream entry with every violation named,
        # before any Spark work starts
        errs = check_config_against_spec(s, STREAM_ENTRY_SPEC)
        if errs:
            raise ValueError(
                f"stream entry {s.get('name', '?')!r} fails the catalog "
                f"spec: {errs}"
            )
        cfg = StreamConfig(
            name=s["name"],
            schema=StructType.fromDDL(s["schema_ddl"]),
            sync_mode=SyncMode(s.get("sync_mode", "incremental")),
            destination_sync_mode=DestinationSyncMode(
                s.get("destination_sync_mode", "append_dedup")
            ),
            primary_key=s.get("primary_key", ["url"]),
            cursor_field=s.get("cursor_field", "warc_ts"),
        )
        src = source_factory(s["source"]["type"])(**s["source"].get("args", {}))
        streams.append(
            ConfiguredStream(
                cfg=cfg,
                source=src,
                target_path=s["target"],
                n_buckets=int(s.get("n_buckets", 16)),
                extract=bool(s.get("extract", True)),
            )
        )
    return SyncCatalog(streams)
