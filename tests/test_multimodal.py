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
