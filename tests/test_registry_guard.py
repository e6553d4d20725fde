"""Registry-count CI guard: the queries()/oracle_sql() registries and the
documented counts must agree — the drift class the round-3 review flagged
twice. No Spark session needed; this is pure bookkeeping."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E

EXPECTED_QUERIES = 120


def test_counts_agree_and_every_query_has_a_value_oracle():
    q, o = E.queries(), E.oracle_sql()
    assert len(q) == EXPECTED_QUERIES
    # every registered query carries a DuckDB value oracle (no rows-only
    # residue since doc_bpe_tokens gained its recursive-CTE oracle)
    assert sorted(q) == sorted(o)
    # dict literal duplicates collapse silently — catch them by comparing
    # against the source text of the registry function
    import inspect

    src = inspect.getsource(E.queries)
    keys = re.findall(r'^\s{8}"([a-z0-9_]+)":', src, re.M)
    assert len(keys) == len(set(keys)), "duplicate registry keys in source"
    assert keys == list(q), "source order != dict order"


def test_readme_count_matches_registry():
    with open("/root/repo/README.md") as fh:
        readme = fh.read()
    m = re.search(r"`queries\(\)` \((\d+) operator queries\)", readme)
    assert m, "README registry-count sentence missing"
    assert int(m.group(1)) == len(E.queries())


def test_driver_window_holds_the_round4_rotation():
    """The first 50 registry entries are the driver's correctness window;
    the round-4 rotation set must sit inside it."""
    window = list(E.queries())[:50]
    rotation = [
        "doc_corpus_stats", "doc_sample_mix", "cdc_url_domains",
        "cdc_url_canonical", "doc_chunk_dedup", "doc_chunk_trim",
        "cdc_schema_normalize", "src_airbyte_messages",
        "doc_bpe_merges", "img_phash_dedup", "audio_mel_features",
        "src_debezium_tail", "sync_delta_log_replay", "doc_bpe_tokens",
        "cdc_matview_incremental",
    ]
    missing = [n for n in rotation if n not in window]
    assert not missing, missing
