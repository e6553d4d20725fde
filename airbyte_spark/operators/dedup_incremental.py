"""Ingest-time incremental dedup against a persistent fingerprint registry.

The one-shot corpus operators (dedup_text.exact_dedup) rescan everything
per run; a 100 TB training-data pipeline instead dedups each ARRIVING
batch against the fingerprints of everything already admitted — cost per
increment ∝ |batch| + |registry ∩ batch|, never ∝ corpus. The registry
is a LakeTable, so admission rides the same ACID/exactly-once machinery
as the CDC sink (≡ the reference's committed-state dedup contract,
BufferedStreamConsumer.java:158-181, applied to content identity instead
of checkpoint identity).

Scale shape:
  - the batch side is fingerprinted with scan-fused column expressions
    (one md5 per doc, no Python);
  - intra-batch winners are a window over the 32-byte digest (one
    shuffle of digests, not documents);
  - the registry probe is a LEFT ANTI join keyed on the digest — the
    registry is bucket-partitioned on fingerprint, so at scale the probe
    co-locates per bucket and AQE broadcasts whichever side is small
    (a batch is tiny next to the corpus registry);
  - admission is one idempotent append commit carrying the batch's
    checkpoint key: a redelivered batch is recognized BEFORE any write
    and its retained set is reconstructed from the registry itself, so
    at-least-once upstream delivery yields exactly-once admission.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import LongType, StringType, StructField, StructType

from airbyte_spark.lake.format import LakeTable, PartitionSpec
from airbyte_spark.operators.textops import fingerprint

REGISTRY_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType(), False),
        StructField("doc_id", LongType(), False),
    ]
)


def create_registry(spark: SparkSession, path: str, n_buckets: int = 16) -> LakeTable:
    """Fingerprint registry table, bucket-partitioned on the digest so
    batch probes co-locate and admission writes touch only the buckets a
    batch's fingerprints hash to."""
    if LakeTable.exists(path):
        return LakeTable.load(spark, path)
    return LakeTable.create(
        spark, path, REGISTRY_SCHEMA, PartitionSpec.bucket("fingerprint", n_buckets)
    )


def ingest_dedup(
    registry: LakeTable,
    batch: DataFrame,
    checkpoint_key: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit the batch's first-seen documents; drop anything whose content
    fingerprint is already registered (by an earlier batch, or by a
    lower-id doc within this batch). Returns the admitted rows of `batch`
    plus their `fingerprint`. Exactly-once: re-delivering a committed
    checkpoint_key returns the identical admitted set and writes nothing.
    """
    fp = batch.withColumn("fingerprint", fingerprint(F.col(text_col)))
    if checkpoint_key in registry.committed():
        # redelivery: the admitted set is exactly this batch's rows whose
        # (fingerprint, id) pair made it into the registry
        reg = registry.read().withColumnRenamed("doc_id", "_reg_id")
        return (
            fp.join(reg, "fingerprint")
            .filter(F.col(id_col) == F.col("_reg_id"))
            .drop("_reg_id")
        )
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    head = (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    admitted = head.join(
        registry.read().select("fingerprint"), "fingerprint", "left_anti"
    )
    # a batch is re-derivable, so cache the admitted set for the two
    # actions below (registry append + caller's consumption) instead of
    # recomputing the window + anti-join per action
    admitted = admitted.cache()
    registry.append(
        admitted.select("fingerprint", F.col(id_col).alias("doc_id")),
        checkpoint_key=checkpoint_key,
    )
    return admitted


def stream_ingest_dedup(
    registry: LakeTable,
    doc_stream,
    spark_checkpoint_dir: str,
    sink: "callable | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Incremental dedup as a Structured Streaming stage: each micro-batch
    is admitted via ingest_dedup under a batch-derived checkpoint key, so
    exactly-once admission holds even if the Spark streaming checkpoint
    is lost and epochs replay (the registry's committed-set is the source
    of truth, same contract as CdcPipeline.run_stream). `sink(admitted,
    epoch_id)` receives each batch's admitted rows (e.g. to append them
    to the corpus table); drains with trigger(availableNow)."""

    def handle(df: DataFrame, epoch_id: int) -> None:
        # key on the batch's content (id range), not the epoch number:
        # a lost Spark checkpoint renumbers epochs but redelivers the
        # same file splits, and the content key recognizes them
        bounds = df.agg(F.min(id_col), F.max(id_col)).first()
        if bounds[0] is None:
            return
        key = f"docs-{bounds[0]}-{bounds[1]}"
        admitted = ingest_dedup(registry, df, key, text_col, id_col)
        if sink is not None:
            sink(admitted, epoch_id)

    q = (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", spark_checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
