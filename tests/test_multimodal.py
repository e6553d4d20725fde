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
