"""Registry-count CI guard: the queries()/oracle_sql() registries and the
documented counts must agree — the drift class the round-3 review flagged
twice. No Spark session needed; this is pure bookkeeping."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E

EXPECTED_QUERIES = 124


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


def test_driver_window_holds_the_round5_rotation():
    """The first 50 registry entries are the driver's correctness window;
    the round-5 steady-state rotation set (new + implementation-changed +
    the stalest r1 greens) must sit inside it."""
    window = list(E.queries())[:50]
    rotation = [
        # new this round
        "src_sql_incremental", "src_http_substream", "audio_fp_dedup",
        "video_frame_dedup",
        # implementation changed since last green row
        "img_phash_dedup", "src_debezium_tail",
        # last green row is round 1 — the stalest lines
        "doc_exact_dedup", "doc_quality", "doc_language_id",
        "doc_minhash_lsh", "doc_simhash", "emb_cosine_topk", "emb_ivf_topk",
    ]
    missing = [n for n in rotation if n not in window]
    assert not missing, missing
    # the rest of the window is r2-green core; nothing r3/r4-green may
    # occupy a slot while older greens wait
    deferred_r2 = {
        "cdc_checkpoint_metrics", "evt_sessionize", "cdc_dedup_salted",
        "cdc_mor_replay_final_state", "sync_multistream_atomic",
        "sync_clustered_prune", "sync_zorder_prune",
        "sync_compact_roundtrip", "sync_time_travel",
        "sync_respec_roundtrip", "sync_catalog_txn",
    }
    rest = set(window) - set(rotation)
    assert len(rest) == 37 and not (rest & deferred_r2)
