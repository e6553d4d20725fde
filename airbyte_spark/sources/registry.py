"""Source plug-in protocol: a source is any callable (spark, state) -> DataFrame.

≡ the reference's Stream subclass contract (airbyte-cdk python
streams/core.py:43-150: read_records + get_updated_state + stream_slices
overridden per connector): here the whole surface collapses to one
function returning the stream's change DataFrame given the saved state —
slicing is Spark partitioning, and cursor bookkeeping is the engine's
committed-checkpoint set.

Two concrete shapes prove the seam:
  - synthetic_changelog_source: the engine's deterministic test stream
    (sources/changelog.py);
  - mapped_parquet_source: a GENERIC parquet/file changelog with a
    configurable column mapping — the "write a new connector" path: point
    it at any parquet directory and name which physical columns play
    url/cursor/lsn/tombstone (≡ configuring a ConfiguredAirbyteStream's
    cursor_field / primary_key instead of writing Java).

State dict keys understood by the built-ins:
  from_checkpoint: replay only checkpoint ids >= this (resume point)
"""

from __future__ import annotations

from typing import Callable, Protocol

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class Source(Protocol):
    def __call__(self, spark: SparkSession, state: dict) -> DataFrame: ...


_REGISTRY: dict[str, Callable[..., Source]] = {}


def register_source(name: str):
    def deco(factory: Callable[..., Source]):
        _REGISTRY[name] = factory
        return factory

    return deco


def source_factory(name: str) -> Callable[..., Source]:
    if name not in _REGISTRY:
        raise KeyError(f"unknown source '{name}' (have: {sorted(_REGISTRY)})")
    return _REGISTRY[name]


def _apply_state(df: DataFrame, state: dict) -> DataFrame:
    fc = (state or {}).get("from_checkpoint")
    if fc is not None and "checkpoint_id" in df.columns:
        df = df.filter(F.col("checkpoint_id") >= int(fc))
    return df


@register_source("synthetic_changelog")
def synthetic_changelog_source(sf_dir: str, batch_span: int = 1_000) -> Source:
    """The deterministic events→pages change stream used by tests/oracles."""

    def read(spark: SparkSession, state: dict) -> DataFrame:
        from airbyte_spark.sources.changelog import read_changelog

        return _apply_state(read_changelog(spark, sf_dir, batch_span), state)

    return read


@register_source("mapped_parquet")
def mapped_parquet_source(
    path: str,
    column_map: dict[str, str],
    cursor: str = "warc_ts",
    batch_span: int = 1_000,
) -> Source:
    """Generic changelog over any parquet data.

    column_map: {engine column -> physical column or SQL expression}. Must
    cover the stream's payload + cursor + a monotone `_ab_cdc_lsn`; the
    rest of the CDC envelope derives defaults:
      _ab_cdc_updated_at / _emitted_at  default to the cursor
      _ab_cdc_deleted_at default NULL (no tombstones in the physical data)
      checkpoint_id      lsn // batch_span unless mapped explicitly
    """

    def read(spark: SparkSession, state: dict) -> DataFrame:
        raw = spark.read.parquet(path)
        df = raw.select(*[F.expr(expr).alias(name) for name, expr in column_map.items()])
        return _apply_state(_complete_envelope(df, cursor, batch_span, "mapped_parquet"), state)

    return read


def _complete_envelope(
    df: DataFrame, cursor: str, batch_span: int, who: str
) -> DataFrame:
    """Fill the CDC envelope defaults a physical source doesn't carry
    (shared by every generic connector shape)."""
    if "_ab_cdc_lsn" not in df.columns:
        raise ValueError(f"{who} needs a monotone _ab_cdc_lsn mapping")
    df = df.withColumn("_ab_cdc_lsn", F.col("_ab_cdc_lsn").cast("long"))
    if "_ab_cdc_updated_at" not in df.columns and cursor in df.columns:
        df = df.withColumn("_ab_cdc_updated_at", F.col(cursor))
    if "_emitted_at" not in df.columns and cursor in df.columns:
        df = df.withColumn("_emitted_at", F.col(cursor))
    if "_ab_cdc_deleted_at" not in df.columns:
        df = df.withColumn(
            "_ab_cdc_deleted_at", F.lit(None).cast("timestamp_ntz")
        )
    if "checkpoint_id" not in df.columns:
        df = df.withColumn(
            "checkpoint_id", (F.col("_ab_cdc_lsn") / batch_span).cast("long")
        )
    return df


@register_source("jsonl")
def jsonl_source(
    path: str,
    column_map: dict[str, str] | None = None,
    cursor: str = "warc_ts",
    batch_span: int = 1_000,
    sampling_ratio: float = 1.0,
) -> Source:
    """Generic changelog over JSON-lines files with an INFERRED schema —
    the reference's discover step infers a JSON schema from record samples
    (airbyte-cdk schema inference / SourceAcceptanceTest discover
    contract); Spark's JSON reader does the same scan-time inference
    (samplingRatio bounds the inference pass at 100 TB; explicit schemas
    beat inference in production, which is what mapped_parquet's explicit
    path is for).

    column_map: {engine column -> SQL expression over inferred fields};
    JSON carries timestamps as strings, so cursor expressions should cast
    (e.g. "to_timestamp(ts)"). Omitted → fields pass through as inferred
    and only the envelope defaults are added."""

    def read(spark: SparkSession, state: dict) -> DataFrame:
        raw = spark.read.option("samplingRatio", sampling_ratio).json(path)
        df = (
            raw.select(*[F.expr(e).alias(n) for n, e in column_map.items()])
            if column_map
            else raw
        )
        return _apply_state(_complete_envelope(df, cursor, batch_span, "jsonl"), state)

    return read
