"""Ingest-time incremental dedup: per-batch admission against the
fingerprint registry must equal one-shot exact dedup of the union, and
redelivered batches must admit identically without writing."""

from __future__ import annotations

import pyspark.sql.functions as F

from airbyte_spark.operators.dedup_incremental import create_registry, ingest_dedup


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_cross_and_intra_batch_dups_dropped(spark, tmp_path):
    reg = create_registry(spark, str(tmp_path / "reg"), n_buckets=4)
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "Alpha  Beta!"), (3, "gamma")],
        "doc_id long, text string",
    )
    # doc 2 normalizes identically to doc 1 → intra-batch dup
    assert _ids(ingest_dedup(reg, b1, "b1")) == [1, 3]
    b2 = spark.createDataFrame(
        [(4, "ALPHA beta"), (5, "delta"), (6, "delta!")],
        "doc_id long, text string",
    )
    # doc 4 duplicates batch-1 content; doc 6 duplicates doc 5 in-batch
    assert _ids(ingest_dedup(reg, b2, "b2")) == [5]


def test_redelivery_is_exactly_once(spark, tmp_path):
    reg = create_registry(spark, str(tmp_path / "reg"), n_buckets=4)
    b1 = spark.createDataFrame([(1, "aa"), (2, "bb")], "doc_id long, text string")
    first = _ids(ingest_dedup(reg, b1, "k1"))
    v = reg.current_version()
    again = _ids(ingest_dedup(reg, b1, "k1"))
    assert again == first == [1, 2]
    assert reg.current_version() == v  # no new commit on redelivery
    assert reg.read().count() == 2


def test_redelivery_after_registry_reopen(spark, tmp_path):
    from airbyte_spark.lake.format import LakeTable

    path = str(tmp_path / "reg")
    reg = create_registry(spark, path, n_buckets=4)
    b1 = spark.createDataFrame([(1, "xx"), (2, "xx copy")], "doc_id long, text string")
    ingest_dedup(reg, b1, "k1")
    # crash: new handle over the same path must still recognize the key
    reg2 = LakeTable.load(spark, path)
    assert _ids(ingest_dedup(reg2, b1, "k1")) == [1, 2]


def test_incremental_equals_one_shot_exact_dedup(spark, sf_dir, tmp_path):
    from airbyte_spark.operators.dedup_text import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reg = create_registry(spark, str(tmp_path / "reg"), n_buckets=8)
    hi = docs.agg(F.max("doc_id")).first()[0]
    cut = hi // 2
    got = []
    for i, pred in enumerate(
        [F.col("doc_id") <= cut, F.col("doc_id") > cut]
    ):
        admitted = ingest_dedup(reg, docs.filter(pred), f"seg-{i}")
        got.extend(
            (r["doc_id"], r["fingerprint"])
            for r in admitted.select("doc_id", "fingerprint").collect()
        )
    want = {
        (r["doc_id"], r["fingerprint"])
        for r in exact_dedup(docs).select("doc_id", "fingerprint").collect()
    }
    assert set(got) == want and len(got) == len(want)


def test_stream_ingest_dedup_exactly_once(spark, tmp_path):
    """File-source doc stream → per-micro-batch admission; restarting the
    stream with a FRESH Spark checkpoint (epoch renumbering) must not
    re-admit or duplicate anything."""
    from airbyte_spark.operators.dedup_incremental import stream_ingest_dedup

    src = str(tmp_path / "docs")
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta!"), (3, "gamma")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(4, "ALPHA beta"), (5, "delta")], "doc_id long, text string"
    )
    b1.coalesce(1).write.parquet(src + "/seg=0")
    b2.coalesce(1).write.parquet(src + "/seg=1")

    reg = create_registry(spark, str(tmp_path / "reg"), n_buckets=4)
    seen: list[tuple] = []

    def sink(admitted, _epoch):
        seen.extend(
            (r["doc_id"],) for r in admitted.select("doc_id").collect()
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("basePath", src)
        .parquet(src)
    )
    stream_ingest_dedup(reg, stream, str(tmp_path / "ck1"), sink=sink)
    assert sorted(seen) == [(1,), (3,), (5,)]
    assert reg.read().count() == 3

    # crash: new stream, NEW checkpoint dir → all files redeliver
    seen.clear()
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("basePath", src)
        .parquet(src)
    )
    stream_ingest_dedup(reg, stream2, str(tmp_path / "ck2"), sink=sink)
    assert sorted(seen) == [(1,), (3,), (5,)]  # same admissions, no dupes
    assert reg.read().count() == 3
    assert len(reg.committed()) == 2  # still just the two content keys


GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far into the "
    "green hills of the quiet countryside to rest in the shade of a tree"
)
OTHER = (
    "a ship sailed slowly across the wide grey ocean while sailors watched "
    "the distant storm clouds gather above the cold northern waters at dusk"
)


def test_near_dedup_cross_batch_rejection(spark, tmp_path):
    from airbyte_spark.operators.dedup_incremental import (
        create_neardup_registry,
        ingest_near_dedup,
    )

    reg = create_neardup_registry(spark, str(tmp_path / "nreg"), n_buckets=4)
    b1 = spark.createDataFrame(
        [(1, GOOD), (2, GOOD)], "doc_id long, text string"
    )
    # intra-batch near-dup pair → canonical (min id) admitted
    assert _ids(ingest_near_dedup(reg, b1, "n1")) == [1]
    b2 = spark.createDataFrame(
        # doc 3 is a near-dup of the ADMITTED doc 1; doc 4 is fresh
        [(3, GOOD + " extra words at the end"), (4, OTHER)],
        "doc_id long, text string",
    )
    assert _ids(ingest_near_dedup(reg, b2, "n2")) == [4]


def test_near_dedup_redelivery_and_single_batch_equivalence(spark, tmp_path):
    from airbyte_spark.operators.dedup_incremental import (
        create_neardup_registry,
        ingest_near_dedup,
    )
    from airbyte_spark.operators.dedup_text import near_dup_clusters

    docs = spark.createDataFrame(
        [(1, GOOD), (2, GOOD), (3, OTHER), (4, OTHER + " and then some more")],
        "doc_id long, text string",
    )
    reg = create_neardup_registry(spark, str(tmp_path / "nreg"), n_buckets=4)
    got = _ids(ingest_near_dedup(reg, docs, "all"))
    # one-batch ingest ≡ the one-shot connected-components keep set
    want = sorted(
        r["doc_id"] for r in near_dup_clusters(docs).filter("keep").collect()
    )
    assert got == want
    # redelivery: identical admissions, no new commit
    v = reg.current_version()
    assert _ids(ingest_near_dedup(reg, docs, "all")) == got
    assert reg.current_version() == v


def _vec(seed, dim=64):
    import hashlib

    return [
        (int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:4], 16) / 32768.0) - 1.0
        for j in range(dim)
    ]


def _near(v, eps=0.003):
    return [x + (eps if i % 2 == 0 else -eps) for i, x in enumerate(v)]


def test_emb_registry_cross_batch_rejection(spark, tmp_path):
    from airbyte_spark.operators.dedup_incremental import (
        create_emb_registry,
        ingest_emb_dedup,
    )

    reg = create_emb_registry(spark, str(tmp_path / "ereg"), n_buckets=4)
    v1, v2 = _vec("a"), _vec("b")
    b1 = spark.createDataFrame(
        [(1, v1), (2, _near(v1))], "vec_id long, embedding array<float>"
    )
    # intra-batch near-identical pair → canonical only
    got1 = sorted(r["vec_id"] for r in ingest_emb_dedup(reg, b1, "e1").collect())
    assert got1 == [1]
    b2 = spark.createDataFrame(
        # 3 is near-identical to ADMITTED 1; 4 is independent content
        [(3, _near(v1, 0.004)), (4, v2)], "vec_id long, embedding array<float>"
    )
    got2 = sorted(r["vec_id"] for r in ingest_emb_dedup(reg, b2, "e2").collect())
    assert got2 == [4]
    # redelivery: EXACTLY this key's admissions (key-tagged registry rows),
    # no new commit
    v = reg.current_version()
    again = sorted(r["vec_id"] for r in ingest_emb_dedup(reg, b2, "e2").collect())
    assert again == [4]
    assert reg.current_version() == v


def test_emb_registry_admits_distinct_content(spark, tmp_path):
    from airbyte_spark.operators.dedup_incremental import (
        create_emb_registry,
        ingest_emb_dedup,
    )

    reg = create_emb_registry(spark, str(tmp_path / "ereg"), n_buckets=4)
    rows = [(i, _vec(f"s{i}")) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(r["vec_id"] for r in ingest_emb_dedup(reg, df, "all").collect())
    # independent random vectors: hamming ≈ 30 ≫ 20 → all admitted
    assert got == list(range(8))


def test_redelivery_excludes_other_keys_admissions(spark, tmp_path):
    """The same doc delivered in two batches (at-least-once upstream):
    redelivering the SECOND batch must not return the doc that the FIRST
    batch admitted."""
    reg = create_registry(spark, str(tmp_path / "reg"), n_buckets=4)
    doc42 = (42, "some unique content here")
    b1 = spark.createDataFrame([doc42, (1, "aa")], "doc_id long, text string")
    b2 = spark.createDataFrame([doc42, (2, "bb")], "doc_id long, text string")
    assert _ids(ingest_dedup(reg, b1, "k1")) == [1, 42]
    assert _ids(ingest_dedup(reg, b2, "k2")) == [2]  # 42 already admitted by k1
    # redeliver k2: must be [2], NOT [2, 42]
    assert _ids(ingest_dedup(reg, b2, "k2")) == [2]


def test_null_text_never_admitted(spark, tmp_path):
    reg = create_registry(spark, str(tmp_path / "reg"), n_buckets=4)
    b = spark.createDataFrame(
        [(1, "real content"), (2, None)], "doc_id long, text string"
    )
    assert _ids(ingest_dedup(reg, b, "k1")) == [1]
    assert reg.read().filter("fingerprint IS NULL").count() == 0
    # redelivery reproduces the same set (no NULL-key join dropout)
    assert _ids(ingest_dedup(reg, b, "k1")) == [1]


def test_near_dedup_registers_all_member_keys(spark, tmp_path):
    """Non-canonical members' band keys must be registered (owned by the
    canonical), so later docs chaining through a rejected member still
    collide with the registry."""
    from airbyte_spark.operators.dedup_incremental import (
        create_neardup_registry,
        ingest_near_dedup,
    )
    from airbyte_spark.operators.dedup_text import lsh_band_keys

    reg = create_neardup_registry(spark, str(tmp_path / "nreg"), n_buckets=4)
    b1 = spark.createDataFrame(
        [(1, GOOD), (2, GOOD + " with a small tail difference")],
        "doc_id long, text string",
    )
    admitted = _ids(ingest_near_dedup(reg, b1, "n1"))
    assert admitted == [1]  # 2 clustered with 1, canonical admitted
    # the registry must hold BOTH docs' band keys, all owned by doc 1
    want = {
        (r["band"], r["key"])
        for r in lsh_band_keys(b1).select("band", "key").distinct().collect()
    }
    got = {(r["band"], r["key"]) for r in reg.read().select("band", "key").collect()}
    assert got == want
    assert {r["doc_id"] for r in reg.read().collect()} == {1}


def test_stream_key_survives_regrouping(spark, tmp_path):
    """A lost Spark checkpoint may regroup file splits; the content-derived
    key must re-run admission for the regrouped batch (convergent) instead
    of mistaking it for a redelivery and dropping its new docs."""
    from airbyte_spark.operators.dedup_incremental import stream_ingest_dedup

    src = str(tmp_path / "docs")
    b1 = spark.createDataFrame([(1, "aa"), (2, "bb")], "doc_id long, text string")
    b2 = spark.createDataFrame([(3, "cc")], "doc_id long, text string")
    b1.coalesce(1).write.parquet(src + "/seg=0")
    b2.coalesce(1).write.parquet(src + "/seg=1")
    reg = create_registry(spark, str(tmp_path / "reg"), n_buckets=4)
    seen: list[int] = []

    def sink(admitted, _e):
        seen.extend(r["doc_id"] for r in admitted.select("doc_id").collect())

    def rd(n_files):
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", n_files)
            .option("basePath", src)
            .parquet(src)
        )

    stream_ingest_dedup(reg, rd(1), str(tmp_path / "ck1"), sink=sink)
    assert sorted(seen) == [1, 2, 3]
    # regroup: both files in ONE batch (different key than either original)
    seen.clear()
    stream_ingest_dedup(reg, rd(2), str(tmp_path / "ck2"), sink=sink)
    assert seen == []  # everything already registered — and nothing lost
    assert reg.read().count() == 3


def test_short_docs_do_not_crash_near_dedup(spark, tmp_path):
    """Docs with < n words used to abort the whole batch under ANSI mode
    (descending sequence → element_at out of range); they must shingle to
    empty and sail through as unique singletons."""
    from airbyte_spark.operators.dedup_incremental import (
        create_neardup_registry,
        ingest_near_dedup,
    )

    reg = create_neardup_registry(spark, str(tmp_path / "nreg"), n_buckets=4)
    b = spark.createDataFrame(
        [(1, "aa"), (2, ""), (3, GOOD)], "doc_id long, text string"
    )
    assert _ids(ingest_near_dedup(reg, b, "k1")) == [1, 2, 3]


def test_registry_schema_migration(spark, tmp_path):
    """A registry created by the pre-checkpoint_key code version must be
    evolved on open: old rows NULL-fill (still dedup by fingerprint),
    new commits reconstruct per-key, nothing crashes."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from airbyte_spark.lake.format import LakeTable, PartitionSpec

    path = str(tmp_path / "reg")
    old_schema = StructType(
        [
            StructField("fingerprint", StringType(), False),
            StructField("doc_id", LongType(), False),
        ]
    )
    old = LakeTable.create(
        spark, path, old_schema, PartitionSpec.bucket("fingerprint", 4)
    )
    legacy = spark.createDataFrame(
        [(1, "legacy content")], "doc_id long, text string"
    )
    from airbyte_spark.operators.textops import fingerprint as fp_col

    old.append(
        legacy.select(
            fp_col(F.col("text")).alias("fingerprint"), F.col("doc_id")
        ),
        checkpoint_key="legacy-k",
    )
    reg = create_registry(spark, path, n_buckets=4)  # evolves schema
    b = spark.createDataFrame(
        [(2, "legacy content"), (3, "fresh content")], "doc_id long, text string"
    )
    assert _ids(ingest_dedup(reg, b, "k2")) == [3]  # legacy row still dedups
    assert _ids(ingest_dedup(reg, b, "k2")) == [3]  # redelivery reconstructs
    # legacy key predates per-key tagging → reconstructs to empty, not crash
    assert _ids(ingest_dedup(reg, legacy, "legacy-k")) == []


def test_emb_empty_batch_commits_key(spark, tmp_path):
    from airbyte_spark.operators.dedup_incremental import (
        create_emb_registry,
        ingest_emb_dedup,
    )

    reg = create_emb_registry(spark, str(tmp_path / "ereg"), n_buckets=4)
    empty = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>"
    )
    assert ingest_emb_dedup(reg, empty, "e0").count() == 0
    assert "e0" in reg.committed()  # key recorded despite zero admissions


def test_srp_near_dups_null_and_empty_inputs(spark):
    from airbyte_spark.operators.similarity import srp_near_dups

    mixed = spark.createDataFrame(
        [(1, None), (2, _vec("z"))], "vec_id long, embedding array<float>"
    )
    assert srp_near_dups(mixed).count() == 0  # no crash, singleton corpus
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert srp_near_dups(empty).count() == 0


def _img_rows(specs):
    """(id, seed, noise) → (id, ppm bytes); seed controls content."""
    import numpy as np

    def pattern(seed, noise):
        rng = np.random.RandomState(100 + noise)
        y, x = np.mgrid[0:48, 0:64]
        base = (
            np.sin(x / (5.0 + seed)) * 80 + np.cos(y / (9.0 + 2 * seed)) * 60 + 120
        ).clip(0, 255)
        img = np.stack([base, base * 0.8, base * 0.5], axis=-1)
        if noise:
            img = img + rng.randint(-noise, noise + 1, size=img.shape)
        return img.clip(0, 255).astype("uint8")

    out = []
    for i, seed, noise in specs:
        arr = pattern(seed, noise)
        out.append((i, bytearray(b"P6\n64 48\n255\n" + arr.tobytes())))
    return out


def test_image_registry_cross_batch_rejection(spark, tmp_path):
    from airbyte_spark.operators.dedup_incremental import (
        create_image_registry,
        ingest_image_dedup,
    )

    reg = create_image_registry(spark, str(tmp_path / "ireg"), n_buckets=4)
    # batch 1: two distinct images + an intra-batch noisy near-dup of the first
    b1 = spark.createDataFrame(
        _img_rows([(1, 0, 0), (2, 0, 2), (3, 5, 0)]), "doc_id long, data binary"
    )
    got1 = sorted(r["doc_id"] for r in ingest_image_dedup(reg, b1, "i1").collect())
    assert got1 == [1, 3]  # 2 is a near-dup cluster member of 1
    # batch 2: near-dup of an ADMITTED image + undecodable bytes + fresh one
    b2 = spark.createDataFrame(
        _img_rows([(10, 0, 1), (11, 9, 0)]) + [(12, bytearray(b"junk"))],
        "doc_id long, data binary",
    )
    got2 = sorted(r["doc_id"] for r in ingest_image_dedup(reg, b2, "i2").collect())
    assert 10 not in got2          # rejected against the registry
    assert 11 in got2              # fresh content admitted
    assert 12 not in got2          # no fingerprint → not admitted
    # redelivery is exactly-once: same admitted set, no registry growth
    v = reg.current_version()
    again = sorted(r["doc_id"] for r in ingest_image_dedup(reg, b2, "i2").collect())
    assert again == got2 and reg.current_version() == v


def _wav_rows(specs):
    """(id, base_exponent, pattern_idx, amp, phase) → (id, wav bytes)."""
    import struct

    import numpy as np

    rate, n = 8000, 8192
    patterns = [[0, 1, 2, 3], [3, 2, 1, 0], [0, 3, 0, 3]]
    out = []
    for i_, e, p, amp, ph in specs:
        seg = n // 4
        idx = np.arange(seg)
        pcm = np.concatenate(
            [
                np.round(
                    amp * np.sign(np.sin(2 * np.pi * 160.0 * (1.5 ** (e + d)) * idx / rate + ph))
                ).astype("<i2")
                for d in patterns[p]
            ]
        )
        data = pcm.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        out.append(
            (i_, bytearray(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks))
        )
    return out


def test_audio_registry_cross_batch_rejection(spark, tmp_path):
    """The audio leg of the banded-registry family: same admission
    contract as images — intra-batch clustering, cross-batch rejection
    within max_hamming of a registered fingerprint, unparseable bytes
    dropped, exactly-once redelivery."""
    from airbyte_spark.operators.dedup_incremental import (
        create_audio_registry,
        ingest_audio_dedup,
    )

    reg = create_audio_registry(spark, str(tmp_path / "areg"), n_buckets=4)
    # batch 1: two distinct melodies + a volume/phase variant of the first
    b1 = spark.createDataFrame(
        _wav_rows([
            (1, 0, 0, 12000.0, 0.0),
            (2, 0, 0, 7000.0, 0.6),   # near-dup of 1 (volume+phase)
            (3, 2, 1, 12000.0, 0.0),  # different melody
        ]),
        "doc_id long, data binary",
    )
    got1 = sorted(r["doc_id"] for r in ingest_audio_dedup(reg, b1, "a1").collect())
    assert got1 == [1, 3]
    # batch 2: variant of an ADMITTED clip + junk bytes + fresh melody
    b2 = spark.createDataFrame(
        _wav_rows([(10, 0, 0, 9000.0, 0.3), (11, 4, 2, 12000.0, 0.0)])
        + [(12, bytearray(b"junk"))],
        "doc_id long, data binary",
    )
    got2 = sorted(r["doc_id"] for r in ingest_audio_dedup(reg, b2, "a2").collect())
    assert 10 not in got2 and 11 in got2 and 12 not in got2
    # redelivery is exactly-once
    v = reg.current_version()
    again = sorted(r["doc_id"] for r in ingest_audio_dedup(reg, b2, "a2").collect())
    assert again == got2 and reg.current_version() == v


def _video_rows(specs):
    """(id, [(img_cls, img_variant), ...]) → (id, concatenated-P6 bytes)
    reusing the image fixture's class rasters as frames."""
    import numpy as np

    def ppm(cls, v):
        rng = np.random.default_rng(977 + cls)
        coarse = rng.integers(0, 256, (8, 8)).astype(np.float64)
        if v == 2:
            coarse[3, 3] = min(255.0, coarse[3, 3] + 80.0)
        img = np.kron(coarse, np.ones((8, 8))).astype(np.uint8)
        return b"P6\n64 64\n255\n" + np.repeat(img[:, :, None], 3, axis=2).tobytes()

    return [
        (i, bytearray(b"".join(ppm(c, v) for c, v in fr))) for i, fr in specs
    ]


def test_video_registry_containment_admission(spark, tmp_path):
    """The video leg's frame-containment semantics: a re-encode of a
    registered clip (same frame classes, perturbed variants) is rejected;
    a MASHUP whose frames all exist in the registry but split across two
    different registered videos stays below the per-video theta bar and
    admits; unparseable bytes drop; redelivery is exactly-once."""
    from airbyte_spark.operators.dedup_incremental import (
        create_video_registry,
        ingest_video_dedup,
    )

    reg = create_video_registry(spark, str(tmp_path / "vreg"), n_buckets=4)
    # batch 1: clip A (classes 0-3), clip B (classes 5-8), an intra-batch
    # re-cut of A (same classes, perturbed frames)
    b1 = spark.createDataFrame(
        _video_rows([
            (1, [(0, 0), (1, 0), (2, 0), (3, 0)]),
            (2, [(5, 0), (6, 0), (7, 0), (8, 0)]),
            (3, [(0, 2), (1, 2), (2, 2), (3, 2)]),  # near-dup of 1
        ]),
        "doc_id long, data binary",
    )
    got1 = sorted(r["doc_id"] for r in ingest_video_dedup(reg, b1, "v1").collect())
    assert got1 == [1, 2]
    # batch 2: re-encode of A + a mashup (2 frames of A, 2 of B) + junk +
    # a fresh clip
    b2 = spark.createDataFrame(
        _video_rows([
            (10, [(0, 2), (1, 0), (2, 2), (3, 0)]),   # ≥ theta vs A: reject
            (11, [(0, 0), (1, 0), (5, 0), (6, 0)]),   # 0.5 vs A, 0.5 vs B: admit
            (12, [(10, 0), (11, 0), (9, 0), (4, 0)]),  # fresh: admit
        ]) + [(13, bytearray(b"junk"))],
        "doc_id long, data binary",
    )
    got2 = sorted(r["doc_id"] for r in ingest_video_dedup(reg, b2, "v2").collect())
    assert 10 not in got2, "re-encode must hit per-video containment"
    assert 11 in got2, "mashup splits below theta per registered video"
    assert 12 in got2 and 13 not in got2
    # redelivery is exactly-once
    v = reg.current_version()
    again = sorted(r["doc_id"] for r in ingest_video_dedup(reg, b2, "v2").collect())
    assert again == got2 and reg.current_version() == v


def test_image_probe_fanout_stays_o_batch_vs_grown_registry(spark, tmp_path):
    """The 100×-scale contract of the asymmetric 16-bit banding: probe
    candidate rows stay O(batch) against a registry 100× the batch size.
    With 4×16-bit band keys + probe-side hamming-1 balls, a probe image
    expects |registry|·68/(4·2^16) candidates ≈ 0.05·|reg_images|/1000 —
    the old 8×8-bit keys gave |reg_images|/32 per probe (156 here), which
    is what made admission cost creep toward O(registry). Registry sigs
    are synthetic uniform hashes (the adversarial-free average case the
    bound is about); recall at exactly max_hamming=7 is pinned too."""
    import numpy as np

    from airbyte_spark.operators.dedup_incremental import (
        _phash_band_keys,
        create_image_registry,
    )

    rng = np.random.default_rng(7)
    n_reg, n_probe = 5_000, 50
    reg_sigs = rng.integers(-(2**63), 2**63, size=n_reg, dtype=np.int64)
    reg = create_image_registry(spark, str(tmp_path / "reg"), n_buckets=4)
    reg_fps = spark.createDataFrame(
        [(int(i), int(s)) for i, s in enumerate(reg_sigs)], "vec_id long, sig long"
    )
    reg.append(
        _phash_band_keys(reg_fps, bands=4).select(
            "band", "key", F.col("vec_id").alias("doc_id"), "sig",
            F.lit("grown").alias("checkpoint_key"),
        ),
        checkpoint_key="grown",
    )
    probe_sigs = rng.integers(-(2**63), 2**63, size=n_probe, dtype=np.int64)
    probe_fps = spark.createDataFrame(
        [(int(1_000_000 + i), int(s)) for i, s in enumerate(probe_sigs)],
        "vec_id long, sig long",
    )
    probe = _phash_band_keys(probe_fps, bands=4, ball_radius=1)
    # probe emits exactly 4·(1+16) = 68 keys per image
    assert probe.count() == n_probe * 68
    candidates = probe.join(
        reg.read().select("band", "key"), ["band", "key"]
    ).count()
    # expectation ≈ 50·68·5000/(4·65536) ≈ 65 rows TOTAL; bound with slack
    # at 30/probe — the old 8-bit scheme averages 156/probe (7800 total)
    assert candidates <= n_probe * 30, candidates
    # recall pinned at the guarantee boundary: 7 flipped bits spread
    # worst-case (2+2+2+1) still collides via the ≤1-error band's ball
    base = int(reg_sigs[0])
    flipped = base
    for bit in (0, 1, 16, 17, 32, 33, 48):  # bands 0-2: 2 errors; band 3: 1
        flipped ^= 1 << bit
    assert bin((base ^ flipped) & ((1 << 64) - 1)).count("1") == 7
    one = spark.createDataFrame([(1, flipped)], "vec_id long, sig long")
    hits = (
        _phash_band_keys(one, bands=4, ball_radius=1)
        .join(reg.read().select("band", "key", F.col("sig").alias("r")), ["band", "key"])
        .filter(F.bit_count(F.col("sig").bitwiseXOR(F.col("r"))) <= 7)
        .select("r")
        .distinct()
        .collect()
    )
    assert base in {int(h["r"]) for h in hits}
