"""End-to-end corpus curation: the retention decision a training-data
pipeline makes per document — quality score + language ID + near-dup
canonical selection, composed from the individual operators.

Scale shape (100 TB): quality and language are pure column expressions
fused into the document scan (zero extra shuffles); the near-dup cluster
branch is the MinHash-LSH + connected-components pipeline (sub-quadratic);
the final assembly is ONE equi-join on doc_id between the scan branch and
the (much smaller) cluster-label table — broadcastable when the candidate
graph is sparse, and AQE picks that automatically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from airbyte_spark.operators.dedup_text import near_dup_clusters
from airbyte_spark.operators.textops import language_id, with_quality


def curate_corpus(
    df: DataFrame,
    min_quality: float = 0.75,
    accept_langs: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per input doc with the curation verdict:
    (doc_id, lang_pred, n_tokens, quality_score, cluster_id, retained).
    retained = canonical near-dup survivor AND quality_score ≥ min_quality
    AND (lang_pred ∈ accept_langs if given). Keeps rejected rows (flagged
    False) so the decision is auditable — filter on `retained` to get the
    training corpus."""
    scan = with_quality(df, text_col).select(
        F.col(id_col).alias("doc_id"),
        language_id(F.col(text_col)).alias("lang_pred"),
        "n_tokens",
        "quality_score",
    )
    clusters = near_dup_clusters(df, text_col, id_col)
    verdict = F.col("keep") & (F.col("quality_score") >= F.lit(min_quality))
    if accept_langs is not None:
        verdict = verdict & F.col("lang_pred").isin(accept_langs)
    return (
        scan.join(clusters, "doc_id")
        .select(
            "doc_id",
            "lang_pred",
            "n_tokens",
            "quality_score",
            "cluster_id",
            verdict.alias("retained"),
        )
    )
