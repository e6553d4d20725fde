"""Mergeable sketches: segment-incremental cardinality + heavy-hitter keys.

Two scale problems the reference never has to face (its per-connector JVM
sees one stream at a time) but a 100 TB Spark ingest does:

  1. "How many distinct urls does this table hold?" asked after every
     commit. Exact COUNT(DISTINCT) rescans the table each time; the
     scale answer is a *mergeable* sketch per ingest segment — Spark 3.5+
     ships Apache DataSketches HLL (`hll_sketch_agg` / `hll_union_agg`),
     so each segment's sketch is computed once in its own commit's scan,
     persisted as a ~KB binary, and any question over any segment range is
     a union of sketches — no data rescan, error ~0.8% at lgK=14.
     Sketch state is order- and partitioning-independent (register-max),
     so estimates are deterministic for a given input set.

  2. "Which keys are hot enough to salt?" — the skew profile that decides
     `presalted_dedup`'s and the merge window's salt factors. Exact
     groupBy(key) is itself the skewed shuffle we're trying to avoid.
     `heavy_hitters` finds every key with global frequency > n/k without
     shuffling the key column: a per-partition Misra-Gries pass (bounded
     O(k·oversample) memory per task, no matter how many distinct keys the
     partition holds) nominates candidates — by the pigeonhole guarantee,
     any globally-heavy key is locally heavy in ≥1 partition — then one
     broadcast semi-join recounts ONLY the candidates exactly. Shuffle
     volume: O(n_partitions × k) candidate rows + the recount of a tiny
     key subset. Output is exact (the sketch only prunes), so a SQL
     HAVING-count oracle verifies it bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Cardinality: per-segment HLL sketches, unionable across any segment range
# ---------------------------------------------------------------------------


def segment_key_sketches(
    df: DataFrame, key: str, segment: str = "checkpoint_id", lgk: int = 14
) -> DataFrame:
    """One mergeable HLL sketch of `key` per `segment` group.

    The per-segment scan this rides on already happens at ingest; the
    sketch adds one map-side-combined aggregate to it. Persist the result
    (a few KB per segment) next to commit metadata to answer cardinality
    questions forever after without touching data files.
    """
    return df.groupBy(F.col(segment).alias("segment")).agg(
        F.hll_sketch_agg(F.col(key).cast("string"), F.lit(lgk)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def union_distinct_estimate(sketches: DataFrame) -> DataFrame:
    """Estimated distinct keys across ALL segments: union the sketches
    (register-max merge, no data access) and read one estimate."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidates -> exact broadcast recount
# ---------------------------------------------------------------------------


def _misra_gries_partition(key_series_iter, m: int) -> dict:
    """Classic Misra-Gries over a stream of pandas Series with m counters.

    Invariant: any key with true partition count > partition_n/m survives
    with a positive counter. Memory is O(m) regardless of distinct keys.
    """
    counters: dict = {}
    for s in key_series_iter:
        for val in s:
            if val in counters:
                counters[val] += 1
            elif len(counters) < m:
                counters[val] = 1
            else:
                # decrement-all step; drop zeros (amortized O(1)/element)
                dead = []
                for k2 in counters:
                    counters[k2] -= 1
                    if counters[k2] == 0:
                        dead.append(k2)
                for k2 in dead:
                    del counters[k2]
    return counters


def heavy_hitters(
    df: DataFrame, key_expr, k: int = 50, oversample: int = 4
) -> DataFrame:
    """Exact (key, n) for every key with global count(*) > n_total/k.

    key_expr: column or SQL-buildable Column (e.g. a domain extraction) —
    evaluated once into a `_hh_key` string column so the MG pass and the
    recount agree on the key bytes.

    oversample widens the local counter budget to m = oversample*k so MG's
    undercount error (≤ partition_n/m) can never evict a globally-heavy
    key before the partition ends. Candidates are a SUPERSET of the true
    heavy hitters; the recount + HAVING filter makes the output exact, so
    a wrong candidate costs a few recounted rows, never correctness.
    """
    keyed = df.select(key_expr.cast("string").alias("_hh_key"))
    m = k * oversample

    def nominate(batches: Iterator) -> Iterator:
        import pandas as pd

        counters = _misra_gries_partition(
            (pdf["_hh_key"] for pdf in batches), m
        )
        if counters:
            yield pd.DataFrame({"_hh_key": list(counters.keys())})

    candidates = (
        keyed.mapInPandas(nominate, schema="_hh_key string").distinct()
    )
    total = keyed.count()
    # recount ONLY candidate keys: broadcast semi-join keeps the heavy
    # column un-shuffled except for the tiny surviving subset
    recount = (
        keyed.join(F.broadcast(candidates), on="_hh_key", how="left_semi")
        .groupBy("_hh_key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") * k > F.lit(total))
    )
    return recount.select(F.col("_hh_key").alias("key"), "n")


def skew_salt_map(
    df: DataFrame, key_expr, k: int = 50, rows_per_task: int = 1_000_000
) -> DataFrame:
    """Hot-key salting plan: for each heavy hitter, the salt fan-out that
    caps any single reducer's share at ~rows_per_task. Broadcast this map
    and join it to the write path: hot keys get `pmod(xxhash64(row), salt)`
    appended to their shuffle key; cold keys (absent from the map) keep
    salt 1. This is the explicit form of what AQE skew-join does at
    runtime, available to any groupBy/window that AQE can't split."""
    return heavy_hitters(df, key_expr, k=k).select(
        "key",
        "n",
        F.greatest(
            F.lit(1), F.ceil(F.col("n") / F.lit(rows_per_task)).cast("int")
        ).alias("salt"),
    )


# ---------------------------------------------------------------------------
# Quantiles: per-segment fixed-width histograms, mergeable by bucket-sum
# ---------------------------------------------------------------------------


def segment_histograms(
    df: DataFrame,
    value_col: str,
    segment: str = "checkpoint_id",
    bucket_width: int = 16,
) -> DataFrame:
    """One fixed-width histogram of `value_col` per `segment` group — the
    mergeable quantile sketch for commit-time distribution tracking
    ("what's the p99 extracted-text length of this crawl segment / of the
    whole table?").

    A histogram row is (segment, bucket, n) with bucket = value DIV width.
    Like the HLL sketches above it rides the ingest scan (one map-side-
    combined aggregate), is a few KB per segment at realistic widths, and
    MERGES exactly: histograms over any segment range sum per bucket —
    order- and partitioning-independent, so results are deterministic and
    a plain-SQL oracle reproduces them bit-for-bit (pure integer math; the
    trade vs KLL/t-digest sketches is a fixed absolute resolution of
    `bucket_width` instead of a relative-rank guarantee, which is the
    right trade when the tracked quantity has a known bounded range, as
    byte/char lengths do)."""
    b = F.expr(f"CAST({value_col} AS BIGINT) DIV {bucket_width}")
    return (
        df.groupBy(F.col(segment).alias("segment"), b.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def merged_quantiles(
    histograms: DataFrame, qs: list[float], bucket_width: int = 16
) -> DataFrame:
    """Merge per-segment histograms and read quantile estimates.

    For each q: the smallest bucket whose cumulative count reaches
    ceil(q * total); the estimate reported is that bucket's inclusive
    upper bound (bucket+1)*width - 1 — an overestimate by < width, the
    histogram's resolution contract. Pure integer output → exact oracle.

    Plan: bucket-sum (tiny — |buckets| rows), one cumulative window over
    the merged histogram, then a broadcast-range join against the literal
    quantile list. Nothing here touches data files — sketches only."""
    from pyspark.sql import Window

    merged = histograms.groupBy("bucket").agg(F.sum("n").alias("n"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy())
    )
    spark = histograms.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    hit = (
        cum.join(
            F.broadcast(qdf),
            F.col("cum") >= F.ceil(F.col("q") * F.col("total").cast("double")),
        )
        .groupBy("q")
        .agg(
            F.min("bucket").alias("bucket"),
            F.max("total").cast("bigint").alias("n_rows"),
        )
        .select(
            "q",
            ((F.col("bucket") + 1) * F.lit(bucket_width) - 1)
            .cast("bigint")
            .alias("estimate"),
            "n_rows",
        )
    )
    return hit.orderBy("q")
