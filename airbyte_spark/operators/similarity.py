"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an IVF-style
cell-probe variant as the scale path. Training-data-pipeline extensions
beyond the reference's CDC surface.

Scale notes:
  - brute force is O(Q×N) dot products — fine for reranking, wrong as the
    primary search at 10^9 vectors;
  - IVF assigns every vector to its nearest of C centroids (one broadcast
    join, cells materialized once), then each query probes only its
    nprobe nearest cells: cost O(Q×C + Q×N×nprobe/C);
  - all arithmetic is F.zip_with/F.aggregate on double — JVM-side, no
    Python; embeddings stay packed arrays (no explode shuffle).

Determinism: elements are cast float→double before any arithmetic and
ranking ties break on vec_id, so the DuckDB oracle reproduces results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    da, db = _dvec(a), _dvec(b)
    return dot(da, db) / (norm(da) * norm(db))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self-match excluded).

    The query side broadcasts (it is small by construction); the corpus
    scan parallelizes per partition, and the per-query top-k is a window
    rank — at scale, replace the window with a per-partition top-k
    aggregation then re-rank (AQE handles the small final shuffle).
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), _dvec(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), _dvec(F.col(vec_col)).alias("n_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos",
            dot(F.col("q_vec"), F.col("n_vec"))
            / (norm(F.col("q_vec")) * norm(F.col("n_vec"))),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cos")
    )


def ivf_assign(
    corpus: DataFrame,
    num_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest 'centroid' — deterministically the
    vectors with the lowest ids serve as centroids (a seeded k-means would
    slot in here; centroid choice is orthogonal to the search plumbing).
    Returns (vec_id, embedding, cell)."""
    cents = (
        corpus.filter(F.col(id_col) < num_centroids)
        .select(F.col(id_col).alias("c_id"), _dvec(F.col(vec_col)).alias("c_vec"))
    )
    v = corpus.select(F.col(id_col).alias("vec_id"), _dvec(F.col(vec_col)).alias("v_vec"))
    scored = v.crossJoin(F.broadcast(cents)).withColumn(
        "cos",
        dot(F.col("v_vec"), F.col("c_vec")) / (norm(F.col("v_vec")) * norm(F.col("c_vec"))),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("v_vec").alias("embedding"), F.col("c_id").alias("cell"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell-probe ANN: search only vectors in the query's nprobe nearest
    cells. Recall < 1 by design; brute-force cosine_topk is the oracle."""
    assigned = ivf_assign(corpus, num_centroids, id_col, vec_col)
    q_cells = (
        ivf_assign_queries(queries, corpus, num_centroids, nprobe, id_col, vec_col)
    )
    cand = q_cells.join(assigned.withColumnRenamed("vec_id", "n_id"), "cell").filter(
        F.col("q_id") != F.col("n_id")
    )
    scored = cand.withColumn(
        "cos",
        dot(F.col("q_vec"), F.col("embedding"))
        / (norm(F.col("q_vec")) * norm(F.col("embedding"))),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cos")
    )


def ivf_assign_queries(
    queries: DataFrame,
    corpus: DataFrame,
    num_centroids: int,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, q_vec, cell) for each query's nprobe nearest centroid cells."""
    cents = (
        corpus.filter(F.col(id_col) < num_centroids)
        .select(F.col(id_col).alias("c_id"), _dvec(F.col(vec_col)).alias("c_vec"))
    )
    q = queries.select(F.col(id_col).alias("q_id"), _dvec(F.col(vec_col)).alias("q_vec"))
    scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "cos",
        dot(F.col("q_vec"), F.col("c_vec")) / (norm(F.col("q_vec")) * norm(F.col("c_vec"))),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_vec", F.col("c_id").alias("cell"))
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (a_id < b_id) — embedding-based
    near-duplicate detection. Quadratic exact form; at scale, restrict the
    pair space with ivf_assign (same-cell pairs only) first."""
    a = corpus.select(F.col(id_col).alias("a_id"), _dvec(F.col(vec_col)).alias("a_vec"))
    b = corpus.select(F.col(id_col).alias("b_id"), _dvec(F.col(vec_col)).alias("b_vec"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cos",
            dot(F.col("a_vec"), F.col("b_vec"))
            / (norm(F.col("a_vec")) * norm(F.col("b_vec"))),
        )
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )


def embedding_near_dups_bucketed(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for embedding near-dup detection: pair candidates are
    restricted to vectors assigned to the SAME IVF cell, so cost is
    Σ cell² ≈ N²/C instead of N² — the shuffle keys on the cell id, each
    reducer scores only its own cell's pairs, and no executor ever holds
    the cross product of the corpus. Near-duplicates (cos ≥ ~0.95) land in
    the same cell with high probability because both vectors sit closest
    to the same centroid; embedding_near_dups is the exact small-scale
    oracle for recall measurement. Returns (a_id, b_id, cos ≥ threshold).
    """
    assigned = ivf_assign(corpus, num_centroids, id_col, vec_col)
    a = assigned.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"), "cell"
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"), "cell"
    )
    return (
        a.join(b, ["cell"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cos",
            dot(F.col("a_vec"), F.col("b_vec"))
            / (norm(F.col("a_vec")) * norm(F.col("b_vec"))),
        )
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )
