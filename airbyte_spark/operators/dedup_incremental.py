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


NEARDUP_REGISTRY_SCHEMA = StructType(
    [
        StructField("band", LongType(), False),
        StructField("key", StringType(), False),
        StructField("doc_id", LongType(), False),
    ]
)


def create_neardup_registry(
    spark: SparkSession, path: str, n_buckets: int = 16
) -> LakeTable:
    """MinHash band-key registry: one row per (band, key) bucket an
    ADMITTED document occupies. Bucket-partitioned on the band key so a
    batch's collision probe co-locates with the registry partitions."""
    if LakeTable.exists(path):
        return LakeTable.load(spark, path)
    return LakeTable.create(
        spark, path, NEARDUP_REGISTRY_SCHEMA, PartitionSpec.bucket("key", n_buckets)
    )


def ingest_near_dedup(
    registry: LakeTable,
    batch: DataFrame,
    checkpoint_key: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Incremental NEAR-dup admission — the MinHash analog of
    ingest_dedup, and the operator a 100 TB crawl pipeline actually runs:
    each arriving batch is (1) clustered intra-batch via the banded LSH
    self-join + connected components, (2) any cluster that collides with
    a band key already registered by an earlier batch is rejected whole
    (its content is already represented), (3) surviving clusters admit
    their canonical (min-id) member, whose band keys are registered in
    one idempotent commit.

    Cost per increment: the LSH self-join of the BATCH (∝ Σ batch-bucket²)
    plus one (band, key)-keyed semi-join against the registry — never a
    rescan or re-pairing of the admitted corpus. Exactly-once: a
    redelivered checkpoint key reconstructs the admitted set from the
    registry without writing. Recall matches the underlying LSH banding
    (raise num_hashes/bands to tighten).
    """
    from airbyte_spark.operators.dedup_text import (
        lsh_band_keys,
        lsh_pairs,
        near_dup_clusters,
    )

    if checkpoint_key in registry.committed():
        admitted_ids = (
            registry.read().select(F.col("doc_id").alias(id_col)).distinct()
        )
        return batch.join(admitted_ids, id_col, "left_semi")
    keys = lsh_band_keys(batch, text_col, id_col, num_hashes=num_hashes, bands=bands)
    # keys feed the intra-batch self-join, the registry probe, and the
    # admitted-key append — one execution, three consumers
    keys = keys.cache()
    a, b = keys.alias("a"), keys.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    clusters = near_dup_clusters(batch, text_col, id_col, pairs=pairs)
    hit_docs = keys.join(
        registry.read().select("band", "key"), ["band", "key"], "left_semi"
    ).select("doc_id").distinct()
    bad_clusters = (
        clusters.join(hit_docs, "doc_id").select("cluster_id").distinct()
    )
    admitted_ids = (
        clusters.filter(F.col("keep"))
        .join(bad_clusters, "cluster_id", "left_anti")
        .select("doc_id")
    )
    admitted = batch.join(
        admitted_ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    ).cache()
    registry.append(
        keys.join(
            admitted.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
        ).select("band", "key", "doc_id"),
        checkpoint_key=checkpoint_key,
    )
    return admitted


EMB_REGISTRY_SCHEMA = StructType(
    [
        StructField("band", LongType(), False),
        StructField("key", LongType(), False),
        StructField("vec_id", LongType(), False),
        StructField("sig", LongType(), False),
    ]
)


def create_emb_registry(spark: SparkSession, path: str, n_buckets: int = 16) -> LakeTable:
    """SRP band-key registry for embedding admission. Unlike the MinHash
    registry (md5 band keys ≈ 2^128 keyspace, collision ⇒ near-dup), SRP
    band keys live in a 2^w keyspace per band — bucket occupancy
    approaches 1 as the corpus grows, so a collision is only a CANDIDATE:
    the registry stores each admitted vector's full signature and
    admission verifies hamming distance against the colliding entries."""
    if LakeTable.exists(path):
        return LakeTable.load(spark, path)
    return LakeTable.create(
        spark, path, EMB_REGISTRY_SCHEMA, PartitionSpec.bucket("key", n_buckets)
    )


def ingest_emb_dedup(
    registry: LakeTable,
    batch: DataFrame,
    checkpoint_key: str,
    max_hamming: int = 20,
    bits: int = 60,
    bands: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental embedding near-dup admission — the third leg of the
    dedup-at-ingest family (exact text / MinHash text / SRP embeddings):
    each arriving batch is sketched once (matmul pandas UDF), clustered
    intra-batch via banded slice collisions verified by signature hamming
    ≤ max_hamming, clusters colliding-and-verifying against REGISTERED
    signatures are rejected whole, and surviving cluster canonicals are
    admitted with their band keys + signature in one idempotent commit.

    Per-increment cost: the batch's own band self-join plus one
    (band, key)-keyed join against the registry with a popcount filter —
    bit math on packed longs, never embedding arrays, and never a rescan
    of the admitted corpus. With 60-bit sketches, hamming ≈
    bits·angle/π ± √(bits)/2, so max_hamming=20 admits ≈ cos ≥ 0.5
    content as "duplicate" with ~2% false-match per compared pair —
    a sketch-level filter; tighten with more bits."""
    from airbyte_spark.operators.dedup_text import near_dup_clusters
    from airbyte_spark.operators.similarity import srp_signature

    if checkpoint_key in registry.committed():
        admitted_ids = (
            registry.read().select(F.col("vec_id").alias(id_col)).distinct()
        )
        return batch.join(admitted_ids, id_col, "left_semi")
    dim = len(batch.select(vec_col).first()[0])
    width = bits // bands
    mask = (1 << width) - 1
    sig = srp_signature(batch, dim, bits, id_col, vec_col)
    slices = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftrightunsigned(F.col("sig"), bi * width)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for bi in range(bands)
        ]
    )
    keys = (
        sig.select("vec_id", "sig", F.explode(slices).alias("bk"))
        .select("vec_id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
        .cache()
    )
    a, b = keys.alias("a"), keys.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))) <= max_hamming
        )
        .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"))
        .distinct()
    )
    ident = batch.select(F.col(id_col).alias("doc_id"))
    clusters = near_dup_clusters(ident, id_col="doc_id", pairs=pairs)
    reg = registry.read().select("band", "key", F.col("sig").alias("reg_sig"))
    hit_docs = (
        keys.join(reg, ["band", "key"])
        .filter(F.bit_count(F.col("sig").bitwiseXOR(F.col("reg_sig"))) <= max_hamming)
        .select(F.col("vec_id").alias("doc_id"))
        .distinct()
    )
    bad_clusters = clusters.join(hit_docs, "doc_id").select("cluster_id").distinct()
    admitted_ids = (
        clusters.filter(F.col("keep"))
        .join(bad_clusters, "cluster_id", "left_anti")
        .select(F.col("doc_id").alias(id_col))
    )
    admitted = batch.join(admitted_ids, id_col, "left_semi").cache()
    registry.append(
        keys.join(
            admitted.select(F.col(id_col).alias("vec_id")), "vec_id", "left_semi"
        ).select("band", "key", "vec_id", "sig"),
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
