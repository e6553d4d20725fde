"""Ingest-time incremental dedup against persistent registry tables.

The one-shot corpus operators (dedup_text.exact_dedup, near_dup_clusters)
rescan everything per run; a 100 TB training-data pipeline instead dedups
each ARRIVING batch against what was already admitted — cost per increment
∝ |batch| + |registry ∩ batch|, never ∝ corpus. Three registries, one
contract (admit first-seen content, exactly-once per checkpoint key):

  exact  — md5 fingerprint rows; a registry hit IS a duplicate.
  near   — MinHash band-key rows (md5 keys ≈ 2^128 keyspace): a band
           collision is duplicate evidence, and ALL cluster members' keys
           are registered under the canonical id so later docs chaining
           through a non-canonical member still collide.
  emb    — SRP band-key rows (2^w keyspace: bucket occupancy → 1 as the
           corpus grows, so a collision is only a CANDIDATE); the stored
           per-member signature is verified by hamming popcount.

Each registry is a LakeTable, so admission rides the same ACID /
committed-set machinery as the CDC sink (≡ the reference's
BufferedStreamConsumer.java:158-181 contract, applied to content
identity). Every registered row carries the admitting checkpoint_key, so
a redelivered batch reconstructs EXACTLY its own admitted set — not rows
admitted by other deliveries of the same content (at-least-once upstream
is the assumed delivery model).

Memory: intermediate frames are localCheckpoint()ed, not cache()d — the
long-running streaming path would otherwise accumulate pinned storage
blocks across epochs; checkpoint blocks are released when the batch's
DataFrames go out of scope.
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
        # nullable: rows written by a pre-checkpoint_key registry version
        # NULL-fill after schema evolution; they still dedup (the probe
        # keys on fingerprint) but cannot be reconstructed per-key
        StructField("checkpoint_key", StringType(), True),
    ]
)


def _ids_admitted_under(registry: LakeTable, checkpoint_key: str, id_col: str):
    """Distinct ids the given checkpoint key admitted, aliased to the
    caller's id column — the redelivery reconstruction source. Keyed per
    commit so duplicates admitted by a DIFFERENT delivery of the same
    content are not resurrected."""
    return (
        registry.read()
        .filter(F.col("checkpoint_key") == checkpoint_key)
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )


def _open_or_create(
    spark: SparkSession, path: str, schema: StructType, bucket_col: str, n_buckets: int
) -> LakeTable:
    """Load-or-create with forward schema evolution: a registry created by
    an older code version gains newly-added (nullable) columns via the
    lake layer's evolve — old rows NULL-fill on read, no rewrite."""
    if LakeTable.exists(path):
        t = LakeTable.load(spark, path)
        if set(t.schema().fieldNames()) != set(schema.fieldNames()):
            t.evolve_schema(schema)
        return t
    return LakeTable.create(spark, path, schema, PartitionSpec.bucket(bucket_col, n_buckets))


def create_registry(spark: SparkSession, path: str, n_buckets: int = 16) -> LakeTable:
    """Fingerprint registry table, bucket-partitioned on the digest so
    batch probes co-locate and admission writes touch only the buckets a
    batch's fingerprints hash to."""
    return _open_or_create(spark, path, REGISTRY_SCHEMA, "fingerprint", n_buckets)


def ingest_dedup(
    registry: LakeTable,
    batch: DataFrame,
    checkpoint_key: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit the batch's first-seen documents; drop anything whose content
    fingerprint is already registered (by an earlier batch, or by a
    lower-id doc within this batch). NULL-text rows carry no content and
    are never admitted. Returns the admitted rows of `batch` plus their
    `fingerprint`. Exactly-once: re-delivering a committed checkpoint_key
    returns the identical admitted set and writes nothing."""
    fp = batch.filter(F.col(text_col).isNotNull()).withColumn(
        "fingerprint", fingerprint(F.col(text_col))
    )
    if checkpoint_key in registry.committed():
        return fp.join(
            _ids_admitted_under(registry, checkpoint_key, id_col), id_col, "left_semi"
        )
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    head = (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    admitted = head.join(
        registry.read().select("fingerprint"), "fingerprint", "left_anti"
    ).localCheckpoint(eager=True)
    registry.append(
        admitted.select(
            "fingerprint",
            F.col(id_col).alias("doc_id"),
            F.lit(checkpoint_key).alias("checkpoint_key"),
        ),
        checkpoint_key=checkpoint_key,
    )
    return admitted


NEARDUP_REGISTRY_SCHEMA = StructType(
    [
        StructField("band", LongType(), False),
        StructField("key", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("checkpoint_key", StringType(), True),
    ]
)


def create_neardup_registry(
    spark: SparkSession, path: str, n_buckets: int = 16
) -> LakeTable:
    """MinHash band-key registry: one row per (band, key) bucket occupied
    by ANY member of an admitted cluster, owned by the cluster's canonical
    doc_id. Bucket-partitioned on the band key so a batch's collision
    probe co-locates with the registry partitions."""
    return _open_or_create(spark, path, NEARDUP_REGISTRY_SCHEMA, "key", n_buckets)


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
    their canonical (min-id) member, and the band keys of EVERY cluster
    member are registered under the canonical id — so a later doc whose
    only collision is with a rejected (non-canonical) member still hits
    the registry, keeping cross-batch recall equal to the banding's.

    Cost per increment: the LSH self-join of the BATCH (∝ Σ batch-bucket²)
    plus one (band, key)-keyed semi-join against the registry — never a
    rescan or re-pairing of the admitted corpus. Exactly-once: a
    redelivered checkpoint key reconstructs its own admitted set from the
    key-tagged registry rows without writing."""
    from airbyte_spark.operators.dedup_text import (
        band_collision_pairs,
        lsh_band_keys,
        near_dup_clusters,
    )

    batch = batch.filter(F.col(text_col).isNotNull())
    if checkpoint_key in registry.committed():
        return batch.join(
            _ids_admitted_under(registry, checkpoint_key, id_col), id_col, "left_semi"
        )
    keys = lsh_band_keys(
        batch, text_col, id_col, num_hashes=num_hashes, bands=bands
    ).localCheckpoint(eager=True)
    pairs = band_collision_pairs(keys).distinct()
    clusters = near_dup_clusters(batch, text_col, id_col, pairs=pairs)
    hit_docs = keys.join(
        registry.read().select("band", "key"), ["band", "key"], "left_semi"
    ).select("doc_id").distinct()
    bad_clusters = clusters.join(hit_docs, "doc_id").select("cluster_id").distinct()
    ok_clusters = (
        clusters.join(bad_clusters, "cluster_id", "left_anti")
        .localCheckpoint(eager=True)  # feeds both the admit set and the key append
    )
    admitted_ids = ok_clusters.filter(F.col("keep")).select("doc_id")
    admitted = batch.join(
        admitted_ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    ).localCheckpoint(eager=True)
    # every member's keys, owned by the cluster canonical (= cluster_id)
    member_keys = (
        keys.join(ok_clusters.select("doc_id", "cluster_id"), "doc_id")
        .select(
            "band",
            "key",
            F.col("cluster_id").alias("doc_id"),
            F.lit(checkpoint_key).alias("checkpoint_key"),
        )
        .distinct()
    )
    registry.append(member_keys, checkpoint_key=checkpoint_key)
    return admitted


EMB_REGISTRY_SCHEMA = StructType(
    [
        StructField("band", LongType(), False),
        StructField("key", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("sig", LongType(), False),
        StructField("checkpoint_key", StringType(), True),
    ]
)


def create_emb_registry(spark: SparkSession, path: str, n_buckets: int = 16) -> LakeTable:
    """SRP band-key registry for embedding admission. Unlike the MinHash
    registry (md5 band keys ≈ 2^128 keyspace, collision ⇒ near-dup), SRP
    band keys live in a 2^w keyspace — bucket occupancy approaches 1 as
    the corpus grows, so a collision is only a CANDIDATE: each row stores
    the occupying member's full signature and admission verifies hamming
    distance against the colliding entries."""
    return _open_or_create(spark, path, EMB_REGISTRY_SCHEMA, "key", n_buckets)


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
    ≤ max_hamming, clusters whose members hamming-match a REGISTERED
    signature are rejected whole, and every member's (band, key, sig) of
    surviving clusters is registered under the canonical id in one
    idempotent commit.

    Per-increment cost: the batch's own band self-join plus one
    (band, key)-keyed join against the registry with a popcount filter —
    bit math on packed longs, never embedding arrays, and never a rescan
    of the admitted corpus. With 60-bit sketches, hamming ≈
    bits·angle/π ± √(bits)/2, so max_hamming=20 treats ≈ cos ≥ 0.5
    content as duplicate with ~2% false-match per compared pair — a
    sketch-level filter; tighten with more bits.

    Unfingerprintable rows are DROPPED, not admitted: a batch row with a
    NULL embedding (filtered here) or one yielding no SRP signature
    (e.g. an empty array — nothing to band) has no identity to dedup on
    and is excluded from the admitted output, mirroring
    ingest_image_dedup's undecodable-bytes policy. Pre-filter such rows
    if they should pass through unconditionally."""
    from airbyte_spark.operators.dedup_text import (
        band_collision_pairs,
        near_dup_clusters,
    )
    from airbyte_spark.operators.similarity import srp_band_keys

    batch = batch.filter(F.col(vec_col).isNotNull())
    if checkpoint_key in registry.committed():
        return batch.join(
            _ids_admitted_under(registry, checkpoint_key, id_col), id_col, "left_semi"
        )
    first = batch.select(vec_col).first()
    if first is None:
        # empty batch: commit the key (parity with the text registries —
        # committed() consumers must see it as processed), admit nothing
        registry.append(
            registry.spark.createDataFrame([], EMB_REGISTRY_SCHEMA),
            checkpoint_key=checkpoint_key,
        )
        return batch
    dim = len(first[0])
    keys = srp_band_keys(batch, dim, bits, bands, id_col, vec_col).localCheckpoint(
        eager=True
    )
    return _ingest_sig_banded(registry, batch, keys, checkpoint_key, id_col, max_hamming)


def _ingest_sig_banded(
    registry: LakeTable,
    batch: DataFrame,
    keys: DataFrame,
    checkpoint_key: str,
    id_col: str,
    max_hamming: int,
    probe_keys: DataFrame | None = None,
) -> DataFrame:
    """Shared admission core for signature-banded registries (SRP
    embedding sketches, image pHashes): intra-batch cluster via band
    collisions verified by popcount ≤ max_hamming, reject whole clusters
    colliding with a registered signature, admit canonicals, register
    every surviving member's (band, key, sig) under the canonical id.
    `keys` must carry (vec_id, band, key, sig).

    `probe_keys` (optional) is a SUPERSET of `keys` used on the probing
    side only — e.g. a per-band hamming-ball expansion. Only the exact
    `keys` are ever registered, so the registry stays |bands| rows per
    member while probes tolerate per-band error; the candidate joins are
    exact-key equi-joins either way, and the popcount verify keeps
    precision exact."""
    from airbyte_spark.operators.dedup_text import (
        band_collision_pairs,
        near_dup_clusters,
    )

    if probe_keys is None:
        pairs = (
            band_collision_pairs(keys, id_col="vec_id", carry=("sig",))
            .filter(
                F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig"))) <= max_hamming
            )
            .select("a_id", "b_id")
            .distinct()
        )
        probe_keys = keys
    else:
        # probe-side ball vs exact keys: a qualifying pair's clean band
        # collides in BOTH directions (ball ⊇ exact), so the a<b
        # direction alone finds every pair once
        pairs = (
            probe_keys.select(
                F.col("vec_id").alias("a_id"), F.col("sig").alias("a_sig"),
                "band", "key",
            )
            .join(
                keys.select(
                    F.col("vec_id").alias("b_id"), F.col("sig").alias("b_sig"),
                    "band", "key",
                ),
                ["band", "key"],
            )
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(
                F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig"))) <= max_hamming
            )
            .select("a_id", "b_id")
            .distinct()
        )
    ident = keys.select(F.col("vec_id").alias("doc_id")).distinct()
    clusters = near_dup_clusters(ident, id_col="doc_id", pairs=pairs)
    reg = registry.read().select("band", "key", F.col("sig").alias("reg_sig"))
    hit_docs = (
        probe_keys.join(reg, ["band", "key"])
        .filter(F.bit_count(F.col("sig").bitwiseXOR(F.col("reg_sig"))) <= max_hamming)
        .select(F.col("vec_id").alias("doc_id"))
        .distinct()
    )
    bad_clusters = clusters.join(hit_docs, "doc_id").select("cluster_id").distinct()
    ok_clusters = (
        clusters.join(bad_clusters, "cluster_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    admitted_ids = ok_clusters.filter(F.col("keep")).select(
        F.col("doc_id").alias(id_col)
    )
    admitted = batch.join(admitted_ids, id_col, "left_semi").localCheckpoint(
        eager=True
    )
    member_keys = (
        keys.join(
            ok_clusters.select(F.col("doc_id").alias("vec_id"), "cluster_id"),
            "vec_id",
        )
        .select(
            "band",
            "key",
            F.col("cluster_id").alias("doc_id"),
            "sig",
            F.lit(checkpoint_key).alias("checkpoint_key"),
        )
        .distinct()
    )
    registry.append(member_keys, checkpoint_key=checkpoint_key)
    return admitted


def create_image_registry(spark: SparkSession, path: str, n_buckets: int = 16) -> LakeTable:
    """pHash band-key registry (same row shape as the embedding registry:
    band, key, doc_id, sig) for ingest-time image near-dup admission."""
    return _open_or_create(spark, path, EMB_REGISTRY_SCHEMA, "key", n_buckets)


def _phash_band_keys(
    fps: DataFrame, bands: int, ball_radius: int = 0
) -> DataFrame:
    """(*input columns, band, key) rows slicing a 64-bit `sig` column
    into `bands` disjoint (64/bands)-bit keys. `ball_radius=1`
    additionally emits every single-bit flip of each key (the per-band
    hamming-1 ball, 1 + width keys per band) — the PROBE side of the
    asymmetric banding scheme; the registered side always uses radius 0.
    All other input columns (vec_id; for per-frame video signatures also
    the frame index) pass through the explode untouched."""
    width = 64 // bands
    mask = (1 << width) - 1
    deltas = [0] + ([1 << i for i in range(width)] if ball_radius else [])
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("sig"), b * width)
                .bitwiseAND(F.lit(mask))
                .bitwiseXOR(F.lit(d))
                .alias("key"),
            )
            for b in range(bands)
            for d in deltas
        ]
    )
    cols = list(fps.columns)
    return fps.select("*", F.explode(slices).alias("bk")).select(
        *cols, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def ingest_image_dedup(
    registry: LakeTable,
    batch: DataFrame,
    checkpoint_key: str,
    max_hamming: int = 7,
    bands: int = 4,
    id_col: str = "doc_id",
    data_col: str = "data",
) -> DataFrame:
    """Incremental IMAGE near-dup admission — the multimodal leg of the
    dedup-at-ingest family: each batch's images are pHashed once (one
    Arrow-batched decode pass over the real raster path), banded into
    wide 16-bit slices, clustered intra-batch, and any cluster colliding
    within max_hamming of a REGISTERED hash is rejected whole.

    Banding is ASYMMETRIC: the registry stores only the 4 exact 16-bit
    band keys per admitted member, while probes expand each of their band
    keys into its hamming-1 ball (1 + 16 keys per band, 68 total). By
    pigeonhole, hamming ≤ 2·bands−1 = 7 total leaves some band with ≤1
    flipped bit, so the ball probe hits that band's registered exact key —
    recall 1.0 at max_hamming=7, identical to the former 8×8-bit scheme.
    What changes is the keyspace: 2^16 per band instead of 2^8, so
    expected candidates per probe are |registry|·68/(bands·2^16) ≈
    |registry|/3855 rather than |registry|/32 — the registry must reach
    ~quarter-billion images before a probe averages even ONE candidate
    row per ball key, and the popcount verify stays exact either way.
    (Both sides ball-expanded would cut probe keys to 4 but square the
    per-band tolerance the OTHER way — registering the ball instead
    would 17× the registry. Probe-side-only is the right asymmetry for a
    write-once read-many registry.)

    Cost ∝ batch (plus the band-keyed registry join above) — never a
    rescan of admitted images. Rows whose bytes don't decode carry no
    fingerprint and are dropped from admission (route them to the
    codec-equipped path in deployment)."""
    from airbyte_spark.functions.extract import image_phash_udf

    if max_hamming > 2 * bands - 1:
        raise ValueError(
            f"recall guarantee needs max_hamming <= 2*bands-1 "
            f"({max_hamming} > {2 * bands - 1})"
        )
    if checkpoint_key in registry.committed():
        return batch.join(
            _ids_admitted_under(registry, checkpoint_key, id_col), id_col, "left_semi"
        )
    return _ingest_sig64(
        registry, batch, checkpoint_key, image_phash_udf, max_hamming,
        bands, id_col, data_col,
    )


def _ingest_sig64(
    registry: LakeTable,
    batch: DataFrame,
    checkpoint_key: str,
    fp_udf,
    max_hamming: int,
    bands: int,
    id_col: str,
    data_col: str,
) -> DataFrame:
    """Shared 64-bit-fingerprint admission tail (image pHash, audio
    fingerprint): one Arrow-batched fingerprint pass pinned by
    localCheckpoint (the admission flow references its batch several
    times), exact 16-bit band keys registered, hamming-1 ball probe."""
    fps = (
        batch.select(
            F.col(id_col).alias("vec_id"),
            fp_udf(F.col(data_col)).alias("sig"),
        )
        .filter(F.col("sig").isNotNull())
        .localCheckpoint(eager=True)
    )
    keys = _phash_band_keys(fps, bands)
    probe = _phash_band_keys(fps, bands, ball_radius=1)
    return _ingest_sig_banded(
        registry, batch, keys, checkpoint_key, id_col, max_hamming,
        probe_keys=probe,
    )


def create_audio_registry(spark: SparkSession, path: str, n_buckets: int = 16) -> LakeTable:
    """Audio-fingerprint band-key registry (same row shape as the image
    and embedding registries) for ingest-time audio near-dup admission."""
    return _open_or_create(spark, path, EMB_REGISTRY_SCHEMA, "key", n_buckets)


def ingest_audio_dedup(
    registry: LakeTable,
    batch: DataFrame,
    checkpoint_key: str,
    max_hamming: int = 7,
    bands: int = 4,
    id_col: str = "doc_id",
    data_col: str = "data",
) -> DataFrame:
    """Incremental AUDIO near-dup admission — the audio leg of the
    dedup-at-ingest family, completing the multimodal trio (text /
    image / audio over one shared banded-registry core): each batch's
    clips are fingerprinted once (real WAV parse + FFT log-mel →
    sign-of-band-descent 64-bit signature, extract._audio_fp_one —
    volume-invariant by construction), then admitted through exactly the
    image leg's asymmetric 4×16-bit banding: registry stores 4 exact
    keys per admitted clip, probes expand each key into its hamming-1
    ball, recall 1.0 at max_hamming ≤ 2·bands−1 by pigeonhole, expected
    candidates per probe |registry|/3855. Cost ∝ batch; clips whose
    bytes don't parse as PCM WAV (or are shorter than one block
    structure) carry no fingerprint and are dropped from admission."""
    from airbyte_spark.functions.extract import audio_fingerprint_udf

    if max_hamming > 2 * bands - 1:
        raise ValueError(
            f"recall guarantee needs max_hamming <= 2*bands-1 "
            f"({max_hamming} > {2 * bands - 1})"
        )
    if checkpoint_key in registry.committed():
        return batch.join(
            _ids_admitted_under(registry, checkpoint_key, id_col), id_col, "left_semi"
        )
    return _ingest_sig64(
        registry, batch, checkpoint_key, audio_fingerprint_udf, max_hamming,
        bands, id_col, data_col,
    )


def create_video_registry(spark: SparkSession, path: str, n_buckets: int = 16) -> LakeTable:
    """Video frame-signature registry (same row shape as the other
    signature registries; multiple rows per video — one per sampled
    frame per band, each owned by the video's canonical doc_id)."""
    return _open_or_create(spark, path, EMB_REGISTRY_SCHEMA, "key", n_buckets)


def ingest_video_dedup(
    registry: LakeTable,
    batch: DataFrame,
    checkpoint_key: str,
    theta: float = 0.6,
    max_hamming: int = 7,
    bands: int = 4,
    id_col: str = "doc_id",
    data_col: str = "data",
    every_n: int = 1,
    max_frames: int = 16,
) -> DataFrame:
    """Incremental VIDEO near-dup admission — frame-containment
    semantics over the shared banded-registry machinery, completing the
    image/audio/video trio: each batch's videos are parsed once
    (concatenated-P6 stream walk + per-sampled-frame pHash, one
    Arrow-batched pass) and a video is a duplicate of a REGISTERED one
    when ≥ `theta` of its sampled frames hamming-match (≤ max_hamming)
    frames of that ONE registered video — per-video containment, not
    any-frame-anywhere, so a mashup of several known clips is new
    content and admits, while a re-encode / re-container of a known clip
    (frame hashes wobble within the hamming budget) is rejected.
    Intra-batch clustering uses the same rule in either direction.

    Cost ∝ batch frames: the frame keys ride the identical asymmetric
    4×16-bit banding as the image leg (exact keys registered, hamming-1
    ball probes), then ONE aggregation per (probe video, candidate
    video) counts distinct matched frames against the ceil(theta·n)
    bar — no pairwise video comparison ever materializes beyond banded
    candidates. Videos with no parseable frame carry no signature and
    are dropped from admission. Exactly-once per checkpoint key, like
    every registry in this module."""
    from airbyte_spark.functions.extract import make_video_phash_udf
    from airbyte_spark.operators.dedup_text import near_dup_clusters

    if max_hamming > 2 * bands - 1:
        raise ValueError(
            f"recall guarantee needs max_hamming <= 2*bands-1 "
            f"({max_hamming} > {2 * bands - 1})"
        )
    if checkpoint_key in registry.committed():
        return batch.join(
            _ids_admitted_under(registry, checkpoint_key, id_col), id_col, "left_semi"
        )
    sig_udf = make_video_phash_udf(every_n=every_n, max_frames=max_frames)
    frames = (
        batch.select(
            F.col(id_col).alias("vid"), sig_udf(F.col(data_col)).alias("sigs")
        )
        .filter(F.col("sigs").isNotNull())
        .select("vid", F.posexplode("sigs").alias("fidx", "sig"))
        .localCheckpoint(eager=True)  # one parse+hash pass feeds everything
    )
    n_frames = frames.groupBy("vid").agg(F.count(F.lit(1)).alias("n_frames"))
    bar = F.ceil(F.lit(theta) * F.col("n_frames")).cast("long")
    keys = _phash_band_keys(frames, bands)
    probe = _phash_band_keys(frames, bands, ball_radius=1)

    # intra-batch: directional containment a→b, then either-direction edges
    m = (
        probe.select(
            F.col("vid").alias("a_vid"), F.col("fidx").alias("a_fidx"),
            F.col("sig").alias("a_sig"), "band", "key",
        )
        .join(
            keys.select(
                F.col("vid").alias("b_vid"), F.col("sig").alias("b_sig"),
                "band", "key",
            ),
            ["band", "key"],
        )
        .filter(F.col("a_vid") != F.col("b_vid"))
        .filter(F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig"))) <= max_hamming)
        .select("a_vid", "a_fidx", "b_vid")
        .distinct()
    )
    frac = (
        m.groupBy("a_vid", "b_vid")
        .agg(F.count_distinct("a_fidx").alias("matched"))
        .join(n_frames.withColumnRenamed("vid", "a_vid"), "a_vid")
        .filter(F.col("matched") >= bar)
    )
    edges = (
        frac.select(
            F.least("a_vid", "b_vid").alias("a_id"),
            F.greatest("a_vid", "b_vid").alias("b_id"),
        )
        .distinct()
    )
    ident = frames.select(F.col("vid").alias("doc_id")).distinct()
    clusters = near_dup_clusters(ident, id_col="doc_id", pairs=edges)

    # registry: per registered-video containment over its frame rows
    reg = registry.read().select(
        "band", "key", F.col("doc_id").alias("reg_vid"), F.col("sig").alias("reg_sig")
    )
    rmatch = (
        probe.join(reg, ["band", "key"])
        .filter(F.bit_count(F.col("sig").bitwiseXOR(F.col("reg_sig"))) <= max_hamming)
        .select("vid", "fidx", "reg_vid")
        .distinct()
    )
    hit_docs = (
        rmatch.groupBy("vid", "reg_vid")
        .agg(F.count_distinct("fidx").alias("matched"))
        .join(n_frames, "vid")
        .filter(F.col("matched") >= bar)
        .select(F.col("vid").alias("doc_id"))
        .distinct()
    )
    bad_clusters = clusters.join(hit_docs, "doc_id").select("cluster_id").distinct()
    ok_clusters = (
        clusters.join(bad_clusters, "cluster_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    admitted_ids = ok_clusters.filter(F.col("keep")).select(
        F.col("doc_id").alias(id_col)
    )
    admitted = batch.join(admitted_ids, id_col, "left_semi").localCheckpoint(
        eager=True
    )
    member_keys = (
        keys.join(
            ok_clusters.select(F.col("doc_id").alias("vid"), "cluster_id"), "vid"
        )
        .select(
            "band",
            "key",
            F.col("cluster_id").alias("doc_id"),
            "sig",
            F.lit(checkpoint_key).alias("checkpoint_key"),
        )
        .distinct()
    )
    registry.append(member_keys, checkpoint_key=checkpoint_key)
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
    is admitted via ingest_dedup under a CONTENT-derived checkpoint key,
    so exactly-once admission holds even if the Spark streaming checkpoint
    is lost and epochs replay (the registry's committed-set is the source
    of truth, same contract as CdcPipeline.run_stream). `sink(admitted,
    epoch_id)` receives each batch's admitted rows (e.g. to append them
    to the corpus table); drains with trigger(availableNow)."""

    def handle(df: DataFrame, epoch_id: int) -> None:
        # key on the batch's id MULTISET (count + order-independent hash +
        # bounds), not the epoch number or the bounds alone: a lost Spark
        # checkpoint may REGROUP file splits, and a bounds-only key would
        # mistake a regrouped superset for a redelivery and drop its new
        # docs. A regrouped batch gets a fresh key and re-runs admission,
        # which is convergent (already-registered fingerprints anti-join
        # away); an identical redelivery reconstructs its exact set.
        agg = df.agg(
            F.count(F.lit(1)),
            F.sum(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(1 << 32))),
            F.min(id_col),
            F.max(id_col),
        ).first()
        if agg[0] == 0:
            return
        key = f"docs-{agg[2]}-{agg[3]}-n{agg[0]}-h{agg[1]:x}"
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
