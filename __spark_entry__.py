"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full CDC replay through the engine at sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL per query (correctness gate).

The CDC queries run over a deterministic changelog derived from the
`events` table (airbyte_spark/sources/changelog.py) so the DuckDB oracle
can reconstruct the identical stream in SQL.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from airbyte_spark.sources.changelog import changelog_oracle_cte, read_changelog

_CH = changelog_oracle_cte()

# cursor value used by the incremental-scan query (mid-January)
_CURSOR = "2024-01-20 00:00:00"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the sf0.001 change stream through the engine
    (dedup → vectorized extract → LWW MERGE into the lake table) and
    return the final pages table."""
    return _replayed_final_state(spark, "/root/testdata/sf0.001")


# --- engine-backed final state (cached per sf_dir within a session) -------------

_replay_cache: dict[str, DataFrame] = {}


def _replayed_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = f"{id(spark)}:{sf_dir}"
    if key not in _replay_cache:
        from airbyte_spark.streaming.pipeline import CdcPipeline

        path = tempfile.mkdtemp(prefix="airbyte_spark_lake_") + "/pages"
        pipe = CdcPipeline.create_target(spark, path, n_buckets=8)
        pipe.replay(read_changelog(spark, sf_dir))
        _replay_cache[key] = pipe.final_state().select(
            "url", "warc_ts", "text", "lang", "_ab_cdc_lsn"
        )
    return _replay_cache[key]


# --- individual operator queries -------------------------------------------------


def q_cdc_replay_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _replayed_final_state(spark, sf_dir)


def q_cdc_final_state_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as the engine, expressed as one window query —
    the SCD active-row rule (stream_processor.py:695-768)."""
    ch = read_changelog(spark, sf_dir)
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc_nulls_last(), F.col("_ab_cdc_lsn").desc_nulls_last()
    )
    return (
        ch.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & F.col("_ab_cdc_deleted_at").isNull())
        .select("url", "warc_ts", "lang", "_ab_cdc_lsn")
    )


def q_cdc_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-micro-batch window dedup: latest event per url per checkpoint,
    tombstones included (they must win within a batch to delete)."""
    ch = read_changelog(spark, sf_dir)
    w = Window.partitionBy("checkpoint_id", "url").orderBy(
        F.col("warc_ts").desc_nulls_last(), F.col("_ab_cdc_lsn").desc_nulls_last()
    )
    return (
        ch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "checkpoint_id",
            "url",
            "warc_ts",
            "_ab_cdc_lsn",
            F.col("_ab_cdc_deleted_at").isNotNull().alias("is_delete"),
        )
    )


def q_cdc_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized HTML→text extraction over every change event —
    the byte-identical-text invariant, checked for all rows."""
    from airbyte_spark.functions.extract import extract_text

    ch = read_changelog(spark, sf_dir)
    return ch.select(
        F.col("_ab_cdc_lsn").alias("lsn"),
        "url",
        extract_text(F.col("html")).alias("text"),
    )


def q_cdc_scd_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history: start/end validity via lag over the dedup window
    (≡ _airbyte_start_at/_end_at/_active_row, stream_processor.py:635-813)."""
    ch = read_changelog(spark, sf_dir)
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc_nulls_last(), F.col("_ab_cdc_lsn").desc_nulls_last()
    )
    return ch.select(
        "url",
        F.col("warc_ts").alias("start_at"),
        F.lag("warc_ts").over(w).alias("end_at"),
        F.col("_ab_cdc_lsn").alias("lsn"),
        (
            (F.row_number().over(w) == 1) & F.col("_ab_cdc_deleted_at").isNull()
        ).alias("active_row"),
    )


def q_cdc_incremental_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor-based incremental scan: strictly-greater filter on the cursor
    (≡ AbstractJdbcSource.queryTableIncremental, `WHERE cursor > ?`)."""
    ch = read_changelog(spark, sf_dir)
    return ch.filter(F.col("warc_ts") > F.lit(_CURSOR).cast("timestamp_ntz")).select(
        "url", "warc_ts", "_ab_cdc_lsn"
    )


def q_cdc_checkpoint_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-checkpoint metrics: rows, deletes, cursor high-water mark
    (≡ StateDecoratingIterator max-cursor + MessageTracker counts)."""
    ch = read_changelog(spark, sf_dir)
    return ch.groupBy("checkpoint_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("_ab_cdc_deleted_at").isNotNull().cast("long")).alias("n_deletes"),
        F.max("_ab_cdc_lsn").alias("max_lsn"),
        F.max("warc_ts").alias("max_cursor"),
        F.count_distinct(F.col("url")).alias("n_urls"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_replay_final_state": q_cdc_replay_final_state,
        "cdc_final_state_window": q_cdc_final_state_window,
        "cdc_dedup_batch": q_cdc_dedup_batch,
        "cdc_extract_text": q_cdc_extract_text,
        "cdc_scd_history": q_cdc_scd_history,
        "cdc_incremental_cursor": q_cdc_incremental_cursor,
        "cdc_checkpoint_metrics": q_cdc_checkpoint_metrics,
    }


def oracle_sql() -> dict[str, str]:
    final_state = f"""
    WITH ch AS ({_CH}),
    r AS (SELECT *, row_number() OVER (
            PARTITION BY url ORDER BY warc_ts DESC, _ab_cdc_lsn DESC) AS rn
          FROM ch)
    SELECT url, warc_ts, text, lang, _ab_cdc_lsn
    FROM r WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
    """
    return {
        "cdc_replay_final_state": final_state,
        "cdc_final_state_window": f"""
            WITH ch AS ({_CH}),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY url ORDER BY warc_ts DESC, _ab_cdc_lsn DESC) AS rn
                  FROM ch)
            SELECT url, warc_ts, lang, _ab_cdc_lsn
            FROM r WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
        """,
        "cdc_dedup_batch": f"""
            WITH ch AS ({_CH}),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY checkpoint_id, url
                    ORDER BY warc_ts DESC, _ab_cdc_lsn DESC) AS rn
                  FROM ch)
            SELECT checkpoint_id, url, warc_ts, _ab_cdc_lsn,
                   _ab_cdc_deleted_at IS NOT NULL AS is_delete
            FROM r WHERE rn = 1
        """,
        "cdc_extract_text": f"""
            WITH ch AS ({_CH})
            SELECT _ab_cdc_lsn AS lsn, url, text FROM ch
        """,
        "cdc_scd_history": f"""
            WITH ch AS ({_CH})
            SELECT url,
                   warc_ts AS start_at,
                   lag(warc_ts) OVER w AS end_at,
                   _ab_cdc_lsn AS lsn,
                   (row_number() OVER w = 1 AND _ab_cdc_deleted_at IS NULL) AS active_row
            FROM ch
            WINDOW w AS (PARTITION BY url ORDER BY warc_ts DESC, _ab_cdc_lsn DESC)
        """,
        "cdc_incremental_cursor": f"""
            WITH ch AS ({_CH})
            SELECT url, warc_ts, _ab_cdc_lsn
            FROM ch WHERE warc_ts > TIMESTAMP '{_CURSOR}'
        """,
        "cdc_checkpoint_metrics": f"""
            WITH ch AS ({_CH})
            SELECT checkpoint_id,
                   count(*) AS n_events,
                   sum(CASE WHEN _ab_cdc_deleted_at IS NOT NULL THEN 1 ELSE 0 END) AS n_deletes,
                   max(_ab_cdc_lsn) AS max_lsn,
                   max(warc_ts) AS max_cursor,
                   count(DISTINCT url) AS n_urls
            FROM ch GROUP BY checkpoint_id
        """,
    }
