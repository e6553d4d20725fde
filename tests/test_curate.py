"""Curation verdict logic: near-dup canonical ∧ quality ∧ language gate."""

from __future__ import annotations

from airbyte_spark.operators.curate import curate_corpus

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and runs far into the "
    "green hills of the quiet countryside to rest in the shade of a tree"
)

OTHER_EN = (
    "a ship sailed slowly across the wide grey ocean while sailors watched "
    "the distant storm clouds gather above the cold northern waters at dusk"
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, GOOD_EN),     # canonical of the dup pair
            (2, GOOD_EN),     # exact near-dup of 1 → dropped
            (3, "x y z"),     # too short → quality fails
            (4, OTHER_EN),    # unique high-quality doc → retained
        ],
        "doc_id long, text string",
    )


def test_curate_retains_canonical_quality_docs(spark):
    out = {r["doc_id"]: r for r in curate_corpus(_docs(spark)).collect()}
    assert len(out) == 4  # rejected rows kept, flagged
    assert out[1]["retained"] is True
    assert out[2]["retained"] is False and out[2]["cluster_id"] == 1
    assert out[3]["retained"] is False  # low quality, even though canonical
    assert out[4]["retained"] is True
    assert out[1]["lang_pred"] == "en"


def test_curate_language_gate(spark):
    out = {
        r["doc_id"]: r["retained"]
        for r in curate_corpus(_docs(spark), accept_langs=["de"]).collect()
    }
    assert not any(out.values())  # all English → rejected under a de-only gate
