"""Deterministic binlog/WAL-style change stream of web-page records.

The engine's input contract (BASELINE.json input_hint) is a change stream
over pages (url, warc_ts, html, text, lang). This module derives one
deterministically from the driver-provided `events` parquet table
(event_id, ts, user_id, event_type, value, props), so that a DuckDB oracle
can reconstruct the *identical* stream with plain SQL — that side-by-side
is the correctness gate.

Mapping (pure column expressions, no Python row loops):
  url                = 'https://site-<user_id%10>.example.com/p/<user_id>'
                       (~10 hot domains → realistic domain skew)
  warc_ts            = ts                  (LWW cursor)
  lang               = 5-way by user_id%5
  html               = utf-8 bytes of a small page embedding props+event_id
  text               = NULL (extraction happens in the pipeline, §extract)
  _ab_cdc_updated_at = ts
  _ab_cdc_deleted_at = ts when event_type='error' else NULL (~20% tombstones)
  _ab_cdc_lsn        = event_id            (monotone; total-order tiebreak)
  _emitted_at        = ts
  checkpoint_id      = event_id // batch_span

This mirrors the reference's CDC event shape after
DebeziumEventUtils.toAirbyteMessage (bases/debezium/.../DebeziumEventUtils.java:22-65):
payload + updated_at/deleted_at/lsn metadata, with delete tombstones
carrying the key. The expected extracted text for a change event is
'Page <uid> Doc <uid> <props> rev-<event_id>' — what strip-tags extraction
of the html yields — giving the byte-identical-text-per-url test an exact
oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# One checkpoint per this many LSNs at sf0.01 (10k events → 10 checkpoints).
DEFAULT_BATCH_SPAN = 1_000

_LANGS = ["en", "de", "fr", "es", "it"]


def _url_expr():
    return F.concat(
        F.lit("https://site-"),
        (F.col("user_id") % 10).cast("string"),
        F.lit(".example.com/p/"),
        F.col("user_id").cast("string"),
    )


def page_url_expr():
    """Public alias: the url a row of `events` maps to (used by queries
    that probe the page stream by key, e.g. the as-of join)."""
    return _url_expr()


def _lang_expr():
    expr = F.when(F.col("user_id") % 5 == 0, _LANGS[0])
    for i, lang in enumerate(_LANGS[1:], start=1):
        expr = expr.when(F.col("user_id") % 5 == i, lang)
    return expr


def _html_expr():
    # '<html lang="xx"><head><title>Page U</title></head>
    #  <body><h1>Doc U</h1><p>PROPS</p><p>rev-E</p></body></html>'
    return F.encode(
        F.concat(
            F.lit('<html lang="'),
            _lang_expr(),
            F.lit('"><head><title>Page '),
            F.col("user_id").cast("string"),
            F.lit("</title></head><body><h1>Doc "),
            F.col("user_id").cast("string"),
            F.lit("</h1><p>"),
            F.col("props"),
            F.lit("</p><p>rev-"),
            F.col("event_id").cast("string"),
            F.lit("</p></body></html>"),
        ),
        "utf-8",
    )


def read_changelog(
    spark: SparkSession,
    sf_dir: str,
    batch_span: int = DEFAULT_BATCH_SPAN,
) -> DataFrame:
    """Batch read of the full change stream, ordered by nothing (the engine
    must not rely on input order — dedup/merge establish order)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return derive_changelog(events, batch_span)


def derive_changelog(events: DataFrame, batch_span: int = DEFAULT_BATCH_SPAN) -> DataFrame:
    return events.select(
        _url_expr().alias("url"),
        F.col("ts").alias("warc_ts"),
        _html_expr().alias("html"),
        F.lit(None).cast("string").alias("text"),
        _lang_expr().alias("lang"),
        F.col("ts").alias("_ab_cdc_updated_at"),
        F.when(F.col("event_type") == "error", F.col("ts")).alias("_ab_cdc_deleted_at"),
        F.col("event_id").alias("_ab_cdc_lsn"),
        F.col("ts").alias("_emitted_at"),
        (F.col("event_id") / batch_span).cast("long").alias("checkpoint_id"),
    )


def changelog_oracle_cte(batch_span: int = DEFAULT_BATCH_SPAN) -> str:
    """DuckDB SQL reconstructing the same stream from the `events` view.

    `text` here is the *expected post-extraction* text (the html body with
    tags stripped and whitespace collapsed) — SQL never sees the binary.
    """
    return f"""
    SELECT
      'https://site-' || CAST(user_id % 10 AS VARCHAR)
        || '.example.com/p/' || CAST(user_id AS VARCHAR)            AS url,
      ts                                                            AS warc_ts,
      'Page ' || CAST(user_id AS VARCHAR) || ' Doc '
        || CAST(user_id AS VARCHAR) || ' ' || props
        || ' rev-' || CAST(event_id AS VARCHAR)                     AS text,
      CASE CAST(user_id % 5 AS INT)
        WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
        WHEN 3 THEN 'es' ELSE 'it' END                              AS lang,
      ts                                                            AS _ab_cdc_updated_at,
      CASE WHEN event_type = 'error' THEN ts END                    AS _ab_cdc_deleted_at,
      event_id                                                      AS _ab_cdc_lsn,
      ts                                                            AS _emitted_at,
      CAST(event_id // {batch_span} AS BIGINT)                      AS checkpoint_id
    FROM events
    """


def write_changelog_dir(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    batch_span: int = DEFAULT_BATCH_SPAN,
) -> int:
    """Materialize the changelog as one parquet file per checkpoint_id under
    `out_dir` — the on-disk shape a Structured Streaming file source tails
    (one file ≈ one binlog segment). Returns number of checkpoints."""
    df = read_changelog(spark, sf_dir, batch_span)
    n = df.agg(F.max("checkpoint_id")).collect()[0][0] + 1
    # partitionBy gives data/checkpoint_id=K/part-*.parquet; repartition(1)
    # per checkpoint keeps one segment file per checkpoint for ordered tailing.
    (
        df.repartition("checkpoint_id")
        .sortWithinPartitions("_ab_cdc_lsn")
        .write.partitionBy("checkpoint_id")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return int(n)
