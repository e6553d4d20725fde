"""Vectorized HTML→text extraction (Arrow/pandas UDFs, no per-row Python UDFs).

The input_hint's per-row invariant is *byte-identical extracted text per
url*, so the extraction rule is pinned here in one place and covered by
golden-bytes tests (tests/test_extract.py):

  1. decode html bytes as UTF-8 (errors=replace)
  2. drop <script>/<style> elements wholesale
  3. replace every remaining tag with a single space
  4. decode the five core HTML entities
  5. collapse whitespace runs to one space; strip ends

A real deployment would swap step 2-3 for selectolax/lxml behind the same
function signature; those libs are absent in this container, and the regex
rule is deterministic and version-pinned by construction.

This role corresponds to the reference's normalization "transform" stage
(raw JSON blob → typed columns, base-normalization stream_processor.py) —
payload-specific cleansing that runs inside the engine, vectorized.
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

_SCRIPT_RE = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def _extract_one(html: bytes | None) -> str | None:
    if html is None:
        return None
    stripped = _TAG_RE.sub(b" ", _SCRIPT_RE.sub(b" ", html))
    text = stripped.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES:
        text = text.replace(ent, ch)
    return _WS_RE.sub(" ", text).strip()


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction; ~the whole batch crosses in one Arrow buffer."""
    return html.map(_extract_one)


def extract_text(html: Column) -> Column:
    return extract_text_udf(html)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Fill `out_col` from html where the change event didn't carry text
    (CDC deletes carry only the key — keep their text NULL)."""
    return df.withColumn(
        out_col,
        F.when(F.col(html_col).isNotNull(), extract_text(F.col(html_col))).otherwise(
            F.col(out_col) if out_col in df.columns else F.lit(None).cast("string")
        ),
    )


# --- multimodal stubs -----------------------------------------------------------
# Images/audio/video ride along as opaque binary columns with typed metadata.
# The Spark-side plumbing (schema, Arrow batching, signatures) is real; the
# codec itself is stubbed because no image/audio libraries exist in this
# container. Swap the body for PIL/ffmpeg in deployment.


_IMAGE_META_TYPE = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


@pandas_udf(_IMAGE_META_TYPE)
def image_metadata_udf(data: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: derives pseudo-dimensions from the byte
    length so tests are stable. Replace with a real decoder in deployment."""
    lengths = data.map(lambda b: 0 if b is None else len(b))
    return pd.DataFrame(
        {
            "width": (lengths % 1920).astype("int32"),
            "height": (lengths % 1080).astype("int32"),
            "format": lengths.map(lambda n: "png" if n % 2 == 0 else "jpeg"),
        }
    )


def decode_image(data: Column) -> Column:
    raise NotImplementedError(
        "real image decoding requires PIL/opencv, absent in this container; "
        "use image_metadata_udf for the plumbing-level deterministic stub"
    )


_AUDIO_META_TYPE = StructType(
    [
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


@pandas_udf(_AUDIO_META_TYPE)
def audio_metadata_udf(data: pd.Series) -> pd.DataFrame:
    """Deterministic fake probe (≡ ffprobe header parse in deployment):
    rate/channels/duration derived from byte length so tests are stable."""
    lengths = data.map(lambda b: 0 if b is None else len(b))
    return pd.DataFrame(
        {
            "sample_rate": lengths.map(lambda n: 16000 if n % 3 else 44100).astype("int32"),
            "channels": ((lengths % 2) + 1).astype("int32"),
            # fake PCM16 mono estimate: bytes / (2 B/sample × 16 kHz)
            "duration_ms": (lengths * 1000 // 32000).astype("int32"),
        }
    )


def sample_frames(
    df,
    data_col: str = "data",
    id_col: str = "doc_id",
    frame_bytes: int = 4096,
    every_n: int = 10,
    max_frames: int = 8,
):
    """Video frame sampling as a 1→N `mapInPandas` expansion: each input
    row (id, video bytes) yields one output row per sampled frame
    (id, frame_idx, frame binary). The Arrow batch shape, output schema
    and pandas-side expansion (index.repeat — vectorized, no per-row
    Python loop for the fan-out) are the real plumbing; the "frame" itself
    is a deterministic byte slice standing in for an ffmpeg decode, which
    this container cannot run.

    Scale shape: the expansion is a narrow transformation — frames are
    emitted inside the parent row's partition, so a downstream
    per-frame feature UDF runs co-partitioned with no shuffle."""
    from pyspark.sql.types import BinaryType, LongType

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            data = pdf[data_col]
            n_frames = data.map(
                lambda b: 0 if b is None else min(max_frames, max(0, len(b) // (frame_bytes * every_n)))
            )
            idx = pdf.index.repeat(n_frames)
            if len(idx) == 0:
                yield pd.DataFrame({id_col: [], "frame_idx": [], "frame": []}).astype(
                    {id_col: "int64", "frame_idx": "int64", "frame": object}
                )
                continue
            out = pd.DataFrame({id_col: pdf.loc[idx, id_col].values})
            frame_no = out.groupby(id_col).cumcount()
            out["frame_idx"] = frame_no * every_n
            blobs = pdf.loc[idx, data_col].values
            out["frame"] = [
                b[int(i) * frame_bytes : (int(i) + 1) * frame_bytes]
                for b, i in zip(blobs, out["frame_idx"].values)
            ]
            yield out

    return df.select(id_col, data_col).mapInPandas(gen, out_schema)
