"""Multimodal column plumbing: opaque binary payloads + typed metadata via
Arrow-batched UDFs. The codec is a deterministic stub (no image libs in
this container) — the Spark-side schema/batching/signature contracts are
the real subject under test."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.functions.extract import decode_image, image_metadata_udf


def test_image_metadata_schema_and_determinism(spark):
    rows = [(1, b"\x89PNG" + b"x" * 96), (2, b"\xff\xd8" + b"y" * 31), (3, None)]
    df = spark.createDataFrame(rows, "id long, img binary")
    out = df.select("id", image_metadata_udf(F.col("img")).alias("meta"))
    assert out.schema["meta"].dataType.simpleString() == (
        "struct<width:int,height:int,format:string>"
    )
    got = {r["id"]: (r["meta"]["width"], r["meta"]["height"], r["meta"]["format"]) for r in out.collect()}
    assert got[1] == (100, 100, "png")
    assert got[2] == (33, 33, "jpeg")
    assert got[3] == (0, 0, "png")
    # deterministic across partitionings
    got2 = {
        r["id"]: (r["meta"]["width"], r["meta"]["height"], r["meta"]["format"])
        for r in df.repartition(8).select("id", image_metadata_udf(F.col("img")).alias("meta")).collect()
    }
    assert got == got2


def test_real_decoder_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(F.lit(b""))


def test_audio_metadata_schema(spark):
    from airbyte_spark.functions.extract import audio_metadata_udf

    df = spark.createDataFrame([(1, b"a" * 64000), (2, None)], "id long, audio binary")
    out = df.select("id", audio_metadata_udf(F.col("audio")).alias("m")).collect()
    got = {r["id"]: (r["m"]["sample_rate"], r["m"]["channels"], r["m"]["duration_ms"]) for r in out}
    assert got[1] == (16000, 1, 2000)  # 64000 B / 32000 B-per-sec = 2 s
    assert got[2] == (44100, 1, 0)


def test_sample_frames_one_to_many(spark):
    """mapInPandas 1→N expansion: frame rows per video, deterministic
    slices, empty for NULL/short payloads, stable across partitionings."""
    from airbyte_spark.functions.extract import sample_frames

    vids = [
        (1, bytes(range(256)) * 640),  # 160 KB → 4 frames at 4096*10
        (2, b"x" * 2000),              # too short → 0 frames
        (3, None),                     # NULL → 0 frames
    ]
    df = spark.createDataFrame(vids, "doc_id long, data binary")
    out = sample_frames(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], r["frame"]))
    assert set(by_doc) == {1}
    frames = sorted(by_doc[1])
    assert [i for i, _ in frames] == [0, 10, 20, 30]
    src = bytes(range(256)) * 640
    for i, blob in frames:
        assert blob == src[i * 4096 : (i + 1) * 4096]
    out2 = sample_frames(df.repartition(5)).collect()
    assert sorted((r["doc_id"], r["frame_idx"]) for r in out2) == sorted(
        (r["doc_id"], r["frame_idx"]) for r in out
    )


def _ppm(w, h, rgb):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(rgb * (w * h))


def _bmp24(w, h, bgr):
    import struct

    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    rows = (bytes(bgr * w) + b"\x00" * pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return header + info + rows


def test_image_features_real_decode(spark):
    from airbyte_spark.functions.extract import image_features_udf

    df = spark.createDataFrame(
        [
            (1, _ppm(4, 2, [10, 20, 30])),           # uniform RGB(10,20,30)
            (2, _bmp24(3, 3, [30, 20, 10])),          # BGR on disk → same RGB
            (3, b"\x89PNG not decodable here"),
            (4, None),
        ],
        "id long, data binary",
    )
    rows = {r["id"]: r for r in df.select("id", image_features_udf("data").alias("f")).select("id", "f.*").collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["format"]) == (4, 2, "ppm")
    assert (rows[1]["mean_r"], rows[1]["mean_g"], rows[1]["mean_b"]) == (10.0, 20.0, 30.0)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["format"]) == (3, 3, "bmp")
    assert (rows[2]["mean_r"], rows[2]["mean_g"], rows[2]["mean_b"]) == (10.0, 20.0, 30.0)
    assert rows[3]["format"] is None and rows[4]["width"] is None


def test_thumbnail_roundtrip(spark):
    from airbyte_spark.functions.extract import (
        _decode_rgb,
        image_features_udf,
        make_thumbnail_udf,
    )

    big = _ppm(128, 64, [200, 100, 50])
    df = spark.createDataFrame([(1, big)], "id long, data binary")
    thumb = df.select(make_thumbnail_udf(max_side=32)("data").alias("t")).first()["t"]
    fmt, px = _decode_rgb(bytes(thumb))
    assert fmt == "ppm"
    assert px.shape == (16, 32, 3)  # aspect preserved, max side 32
    assert (px.reshape(-1, 3).mean(axis=0) == [200.0, 100.0, 50.0]).all()
    # thumbnails feed straight back into the feature UDF (composable stages)
    tdf = spark.createDataFrame([(1, bytes(thumb))], "id long, data binary")
    f = tdf.select(image_features_udf("data").alias("f")).select("f.*").first()
    assert (f["width"], f["height"]) == (32, 16)


def _wav(rate, ch, samples):
    """Minimal PCM16 RIFF/WAVE with an extra LIST chunk before data (to
    exercise real chunk-walking)."""
    import struct

    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_audio_features_real_wav(spark):
    import math

    from airbyte_spark.functions.extract import audio_features_udf

    # 1 kHz-ish square wave: 8 samples/period at 8 kHz, amplitude 16384
    samples = [16384 if (i // 4) % 2 == 0 else -16384 for i in range(8000)]
    df = spark.createDataFrame(
        [(1, _wav(8000, 1, samples)), (2, b"not audio"), (3, None)],
        "id long, data binary",
    )
    rows = {
        r["id"]: r
        for r in df.select("id", audio_features_udf("data").alias("f"))
        .select("id", "f.*")
        .collect()
    }
    f = rows[1]
    assert (f["sample_rate"], f["channels"], f["duration_ms"]) == (8000, 1, 1000)
    assert math.isclose(f["rms"], 16384 / 32768, rel_tol=1e-6)
    # square wave flips sign every 4 samples → ZCR ≈ 1/4
    assert math.isclose(f["zero_cross_rate"], 0.25, rel_tol=0.01)
    assert rows[2]["sample_rate"] is None and rows[3]["rms"] is None


def test_audio_features_malformed_rate_zero(spark):
    """A header declaring sample_rate=0 must yield NULLs, not a task
    crash."""
    import struct

    from airbyte_spark.functions.extract import audio_features_udf

    pcm = struct.pack("<h", 100) * 4
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)  # rate = 0
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    bad = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    row = (
        spark.createDataFrame([(1, bad)], "id long, data binary")
        .select(audio_features_udf("data").alias("f"))
        .select("f.*")
        .first()
    )
    assert row["sample_rate"] is None and row["rms"] is None


def _ppm_arr(arr):
    import numpy as np

    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.asarray(arr, dtype=np.uint8).tobytes()


def _pattern(h, w, seed=0, noise=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (np.sin(x / 7.0) * 80 + np.cos(y / 11.0) * 60 + 120).clip(0, 255)
    img = np.stack([base, base * 0.8, base * 0.5], axis=-1)
    if noise:
        img = img + rng.randint(-noise, noise + 1, size=img.shape)
    return img.clip(0, 255).astype("uint8")


def test_image_phash_determinism_and_robustness(spark):
    import numpy as np

    from airbyte_spark.functions.extract import _phash_one

    a = _ppm_arr(_pattern(64, 96))
    assert _phash_one(a) == _phash_one(a) is not None
    # mild pixel noise: hamming-close
    b = _ppm_arr(_pattern(64, 96, seed=1, noise=6))
    # downscaled same image: hash survives resampling
    small = _ppm_arr(_pattern(64, 96)[::2, ::2])
    # different content: far
    other = _ppm_arr(np.transpose(_pattern(96, 64), (1, 0, 2)).copy())
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")  # noqa: E731
    pa = _phash_one(a)
    assert ham(pa, _phash_one(b)) <= 6
    assert ham(pa, _phash_one(small)) <= 8
    assert ham(pa, _phash_one(other)) > 12
    assert _phash_one(b"not an image") is None


def test_image_near_dup_pairs_banded(spark):
    from airbyte_spark.functions.extract import image_near_dup_pairs

    rows = [
        (1, bytearray(_ppm_arr(_pattern(64, 96)))),
        (2, bytearray(_ppm_arr(_pattern(64, 96, seed=2, noise=5)))),  # near-dup of 1
        (3, bytearray(_ppm_arr(_pattern(48, 48, seed=3, noise=0) [::-1].copy()))),
        (4, None),
        (5, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in image_near_dup_pairs(df, bands=8, max_hamming=7).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 7
    assert all(k == (1, 2) for k in got), got  # 3 differs; 4/5 undecodable


def test_audio_mel_frequency_ordering(spark):
    import numpy as np

    from airbyte_spark.functions.extract import make_audio_mel_udf

    rate = 16000

    def sine(freq, secs=0.5):
        t = np.arange(int(rate * secs)) / rate
        return (np.sin(2 * np.pi * freq * t) * 16000).astype("<i2")

    rows = [
        (1, bytearray(_wav(rate, 1, sine(500)))),
        (2, bytearray(_wav(rate, 1, sine(3000)))),
        (3, bytearray(b"not audio")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    udf = make_audio_mel_udf(n_mels=16)
    got = {r["doc_id"]: r["mel"] for r in df.select("doc_id", udf("data").alias("mel")).collect()}
    assert got[3] is None
    lo, hi = np.argmax(got[1]), np.argmax(got[2])
    assert hi > lo, (lo, hi)  # higher pitch peaks in a higher mel band
    assert len(got[1]) == 16 and all(np.isfinite(got[1]))


def test_audio_mel_feeds_ann_topk(spark):
    """Integration: mel embeddings flow straight into the ANN suite —
    cosine top-1 over mel vectors retrieves the same-pitch clip."""
    import numpy as np

    from airbyte_spark.functions.extract import make_audio_mel_udf
    from airbyte_spark.operators.similarity import cosine_topk

    rate = 16000

    def sine(freq, secs=0.4, phase=0.0):
        t = np.arange(int(rate * secs)) / rate
        return (np.sin(2 * np.pi * freq * t + phase) * 16000).astype("<i2")

    corpus = spark.createDataFrame(
        [
            (1, bytearray(_wav(rate, 1, sine(500)))),
            (2, bytearray(_wav(rate, 1, sine(3000)))),
            (3, bytearray(_wav(rate, 1, sine(7000)))),
        ],
        "doc_id long, data binary",
    )
    queries = spark.createDataFrame(
        [(10, bytearray(_wav(rate, 1, sine(3000, phase=0.7))))],
        "doc_id long, data binary",
    )
    udf = make_audio_mel_udf(n_mels=16)
    emb = corpus.select("doc_id", udf("data").alias("embedding"))
    q = queries.select("doc_id", udf("data").alias("embedding"))
    top = cosine_topk(q, emb, k=1, id_col="doc_id").collect()
    assert len(top) == 1 and top[0]["n_id"] == 2


def _cls_ppm(cls, v=0):
    import numpy as np

    rng = np.random.default_rng(977 + cls)
    coarse = rng.integers(0, 256, (8, 8)).astype(np.float64)
    if v == 2:
        coarse[3, 3] = min(255.0, coarse[3, 3] + 80.0)
    img = np.kron(coarse, np.ones((8, 8))).astype(np.uint8)
    return b"P6\n64 64\n255\n" + np.repeat(img[:, :, None], 3, axis=2).tobytes()


def test_ppm_stream_split_and_video_signatures(spark):
    """Concatenated-P6 video parsing is a real header walk: frames of
    declared sizes, truncated tails dropped, junk yields no frames; the
    per-frame signatures equal the single-image pHash exactly, and the
    UDF's sampling/cap parameters bound the work per video."""
    from airbyte_spark.functions.extract import (
        _phash_one,
        _split_ppm_frames,
        make_video_phash_udf,
    )

    vid = _cls_ppm(0) + _cls_ppm(1) + _cls_ppm(2) + _cls_ppm(3)
    frames = _split_ppm_frames(vid)
    assert len(frames) == 4 and frames[1] == _cls_ppm(1)
    assert len(_split_ppm_frames(vid[:-100])) == 3  # truncated tail dropped
    assert _split_ppm_frames(b"junk") == []
    # mixed frame sizes parse by their own headers
    small = b"P6\n8 8\n255\n" + bytes(8 * 8 * 3)
    assert [len(f) for f in _split_ppm_frames(small + _cls_ppm(1))] == [
        len(small), len(_cls_ppm(1)),
    ]
    df = spark.createDataFrame(
        [(1, bytearray(vid)), (2, bytearray(b"junk"))], "doc_id long, data binary"
    )
    udf = make_video_phash_udf(every_n=2, max_frames=2)
    got = {r["doc_id"]: r["s"] for r in df.select("doc_id", udf("data").alias("s")).collect()}
    assert got[2] is None
    assert got[1] == [_phash_one(_cls_ppm(0)), _phash_one(_cls_ppm(2))]  # every 2nd frame


def test_video_fixture_frame_margins_over_30_classes():
    """video_frame_dedup's class arithmetic uses image classes 0-29
    (2·cls and 2·cls+1 for 15 video classes): pin the pHash margins over
    that FULL range — the 15-class image pin doesn't cover it."""
    from airbyte_spark.functions.extract import _phash_one

    sig = {(c, v): _phash_one(_cls_ppm(c, v)) for c in range(30) for v in (0, 2)}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    in_class = max(ham(sig[(c, 0)], sig[(c, 2)]) for c in range(30))
    cross = min(
        ham(sig[(c1, v1)], sig[(c2, v2)])
        for c1 in range(30)
        for c2 in range(c1 + 1, 30)
        for v1 in (0, 2)
        for v2 in (0, 2)
    )
    assert in_class <= 7, in_class
    assert cross > 7 + 8, cross


def test_audio_dedup_fixture_distance_margins():
    """The audio_fp_dedup gate's oracle is pure class arithmetic ONLY
    because the melody fixture guarantees in-class hamming ≤ max_hamming
    (7) and cross-class > 7 with wide margin through the
    sign-of-band-descent fingerprint. Pin those margins so a fingerprint
    or generator change that silently erodes them fails here, not in the
    driver gate."""
    import struct

    import numpy as np

    from airbyte_spark.functions.extract import _audio_fp_one

    rate, n = 8000, 8192
    patterns = [[0, 1, 2, 3], [3, 2, 1, 0], [0, 3, 0, 3]]

    def clip(c, vv):
        e, pat = c % 5, patterns[c // 5]
        amp = 7000.0 if vv == 2 else 12000.0
        ph = 0.6 if vv == 2 else 0.0
        seg = n // 4
        i = np.arange(seg)
        pcm = np.concatenate(
            [
                np.round(
                    amp * np.sign(np.sin(2 * np.pi * 160.0 * (1.5 ** (e + d)) * i / rate + ph))
                ).astype("<i2")
                for d in pat
            ]
        )
        data = pcm.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    sig = {(c, v): _audio_fp_one(clip(c, v)) for c in range(15) for v in (0, 2)}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    in_class = max(ham(sig[(c, 0)], sig[(c, 2)]) for c in range(15))
    cross = min(
        ham(sig[(c1, v1)], sig[(c2, v2)])
        for c1 in range(15)
        for c2 in range(c1 + 1, 15)
        for v1 in (0, 2)
        for v2 in (0, 2)
    )
    assert in_class <= 4, in_class  # same cluster under max_hamming=7
    assert cross > 7 + 7, cross  # different cluster, ≥8 bits of margin
    # volume invariance is exact: pure amplitude scaling flips no bit
    half = clip(3, 0)
    # amplitude-only variant (phase 0): rebuild with amp 6000
    e, pat = 3 % 5, patterns[0]
    i = np.arange(n // 4)
    pcm = np.concatenate(
        [
            np.round(6000.0 * np.sign(np.sin(2 * np.pi * 160.0 * (1.5 ** (e + d)) * i / rate))).astype("<i2")
            for d in pat
        ]
    )
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    quiet = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    assert ham(_audio_fp_one(half), _audio_fp_one(quiet)) == 0
    # undecodable / too-short bytes carry no fingerprint
    assert _audio_fp_one(b"not audio") is None
    assert _audio_fp_one(None) is None


def test_img_dedup_fixture_distance_margins():
    """The img_phash_dedup gate's oracle is pure class arithmetic ONLY
    because the fixture guarantees in-class hamming ≤ max_hamming(7) and
    cross-class > 7 with wide margin. Pin those margins so a pHash or
    generator change that silently erodes them fails here, not in the
    driver gate."""
    import numpy as np

    from airbyte_spark.functions.extract import _phash_one

    def ppm(cls, v):
        rng = np.random.default_rng(977 + cls)
        coarse = rng.integers(0, 256, (8, 8)).astype(np.float64)
        if v == 2:
            coarse[3, 3] = min(255.0, coarse[3, 3] + 80.0)
        img = np.kron(coarse, np.ones((8, 8))).astype(np.uint8)
        return b"P6\n64 64\n255\n" + np.repeat(img[:, :, None], 3, axis=2).tobytes()

    sig = {(c, v): _phash_one(ppm(c, v)) for c in range(15) for v in (0, 2)}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    in_class = max(ham(sig[(c, 0)], sig[(c, 2)]) for c in range(15))
    cross = min(
        ham(sig[(c1, v1)], sig[(c2, v2)])
        for c1 in range(15)
        for c2 in range(c1 + 1, 15)
        for v1 in (0, 2)
        for v2 in (0, 2)
    )
    assert in_class <= 7, in_class  # same cluster under max_hamming=7
    assert cross > 7 + 8, cross  # different cluster, with ≥8 bits of margin
