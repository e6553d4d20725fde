"""Per-file key Bloom filters (lake/bloom.py) and merge candidate pruning.

Within one url-hash bucket, file min/max key ranges almost always overlap,
so only a membership filter can prove a file holds none of a batch's keys.
These tests pin: (a) the filter itself (no false negatives, bounded fpp,
sidecar round-trip), (b) sidecar lifecycle alongside data files, and
(c) merge_upsert skipping untouched files while producing the exact same
final state as a bloom-less table."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from airbyte_spark.lake.bloom import KeyBloom, hash_pairs
from airbyte_spark.lake.merge import _merge_bounds, _prune_candidates
from airbyte_spark.schema import CHANGE_SCHEMA
from airbyte_spark.streaming.pipeline import CdcPipeline

T = dt.datetime(2024, 1, 1)


# ---- pure filter unit tests ----


def test_no_false_negatives_and_bounded_fpp():
    keys = [f"https://site-{i}.test/p" for i in range(5_000)]
    bf = KeyBloom.build(keys, fpp=0.01)
    assert all(bf.might_contain(k) for k in keys)
    probes = [f"https://other-{i}.test/q" for i in range(10_000)]
    fp = sum(bf.might_contain_any(hash_pairs([p])) for p in probes)
    assert fp / len(probes) < 0.03  # target 1%, generous margin

    # vectorized any-probe agrees with scalar probes
    assert bf.might_contain_any(hash_pairs([probes[0], keys[17]]))
    misses = [p for p in probes[:50] if not bf.might_contain(p)]
    assert not bf.might_contain_any(hash_pairs(misses))


def test_build_edge_cases_and_roundtrip():
    assert KeyBloom.build([]) is None
    assert KeyBloom.build([None, None]) is None  # NULLs never enter the filter
    bf = KeyBloom.build(["a", None, "b"])
    assert bf.might_contain("a") and bf.might_contain("b")
    rt = KeyBloom.from_bytes(bf.to_bytes())
    assert rt.m == bf.m and rt.k == bf.k
    assert rt.might_contain("a") and not rt.might_contain("zzz-not-there")
    with pytest.raises(ValueError):
        KeyBloom.from_bytes(b"XXXX1234")


def test_build_skips_past_key_cap(monkeypatch):
    import airbyte_spark.lake.bloom as bloom_mod

    monkeypatch.setattr(bloom_mod, "MAX_KEYS", 10)
    assert KeyBloom.build([str(i) for i in range(11)]) is None
    assert KeyBloom.build([str(i) for i in range(10)]) is not None


def test_merge_bounds_tolerates_null_buckets():
    assert _merge_bounds({0: (None, None), 1: ("a", "c")}) == ("a", "c")
    assert _merge_bounds({0: (None, None)}) is None
    assert _merge_bounds({}) is None


# ---- lake integration: sidecar lifecycle ----


def ev(url, lsn, ckpt, text="x", deleted=None):
    ts = T + dt.timedelta(minutes=lsn)
    return (url, ts, None, text, "en", ts, deleted, lsn, ts, ckpt)


@pytest.fixture()
def pipe(spark, tmp_path):
    # ONE bucket: bucket containment can never prune, so any skipped file
    # below is the Bloom filter's doing.
    return CdcPipeline.create_target(spark, str(tmp_path / "pages"), n_buckets=1)


def batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def test_sidecars_written_and_vacuumed(spark, pipe):
    t = pipe.table
    pipe.apply_batch(batch(spark, [ev("u://a", 1, 0), ev("u://b", 2, 0)]), "c0")
    entries = t.files()
    assert entries, "merge produced no files"
    blooms = []
    for e in entries:
        assert "bloom" in e.stats["url"], "manifest stats must reference the sidecar"
        assert os.path.exists(os.path.join(t.path, e.path) + ".bloom")
        blooms.append(t.load_bloom(e, "url"))
    # every written key is findable in some file's filter (no false negatives)
    assert any(bf.might_contain("u://a") for bf in blooms)
    assert any(bf.might_contain("u://b") for bf in blooms)
    # rewriting the key's file replaces data file + sidecar; vacuum reaps both
    pipe.apply_batch(batch(spark, [ev("u://a", 3, 1, text="y")]), "c1")
    t.vacuum()
    live = {e.path for e in t.files()}
    for root, _d, names in os.walk(t.path):
        for n in names:
            rel = os.path.relpath(os.path.join(root, n), t.path)
            if n.endswith(".parquet"):
                assert rel in live
            elif n.endswith(".bloom"):
                assert rel[: -len(".bloom")] in live


def test_merge_skips_files_without_affected_keys(spark, pipe):
    t = pipe.table
    # two disjoint key sets → after two merges, two files in the one bucket
    s1 = pipe.apply_batch(batch(spark, [ev(f"u://one/{i}", i, 0) for i in range(4)]), "c0")
    s2 = pipe.apply_batch(batch(spark, [ev(f"u://two/{i}", 10 + i, 1) for i in range(4)]), "c1")
    assert s1.candidate_files == 0
    assert s2.candidate_files == 0, "disjoint keys must Bloom-prune the first file"
    n_files = len(t.files())
    assert n_files >= 2

    # touching ONE existing key rewrites only the file holding it
    s3 = pipe.apply_batch(batch(spark, [ev("u://one/2", 99, 2, text="upd")]), "c2")
    assert s3.candidate_files == 1

    rows = {r["url"]: r["text"] for r in pipe.final_state().collect()}
    assert len(rows) == 8
    assert rows["u://one/2"] == "upd" and rows["u://two/3"] == "x"


def test_bloom_pruned_state_equals_unpruned(spark, tmp_path):
    """Same merge sequence on a bloom table and a bloom-less table → byte-equal
    final state (pruning is an optimization, never a correctness gate)."""
    from airbyte_spark.lake.format import LakeTable, PartitionSpec
    from airbyte_spark.streaming.pipeline import default_target_schema

    with_bloom = CdcPipeline.create_target(spark, str(tmp_path / "a"), n_buckets=1)
    bare_table = LakeTable.create(
        spark, str(tmp_path / "b"), default_target_schema(), PartitionSpec.bucket("url", 1)
    )
    without = CdcPipeline(table=bare_table, cfg=with_bloom.cfg)

    batches = [
        [ev(f"u://k{i}", i, 0) for i in range(6)],
        [ev("u://k1", 50, 1, text="v2"), ev("u://new", 51, 1)],
        [ev("u://k3", 60, 2, deleted=T), ev("u://k1", 55, 2, text="v3")],
    ]
    stats_a, stats_b = [], []
    for n, rows in enumerate(batches):
        stats_a.append(with_bloom.apply_batch(batch(spark, rows), f"c{n}"))
        stats_b.append(without.apply_batch(batch(spark, rows), f"c{n}"))
    a = sorted(map(tuple, with_bloom.final_state().collect()))
    b = sorted(map(tuple, without.final_state().collect()))
    assert a == b and len(a) == 6  # k3 deleted, new inserted
    # and the bloom table touched no more files than the bloom-less one
    assert all(
        sa.candidate_files <= sb.candidate_files for sa, sb in zip(stats_a, stats_b)
    )


def test_prune_handles_null_marked_buckets(spark, pipe):
    """A bucket whose winner set includes a NULL key is marked unprunable
    (value None in winner_hashes): its files must all stay candidates."""
    t = pipe.table
    pipe.apply_batch(batch(spark, [ev("u://a", 1, 0)]), "c0")
    bounds = {0: (None, None)}
    kept = _prune_candidates(t, bounds, "url", winner_hashes={0: None})
    assert len(kept) == len(t.files())
    # whereas a disjoint concrete key set prunes everything
    kept2 = _prune_candidates(t, bounds, "url", winner_hashes={0: hash_pairs(["u://zz"])})
    assert kept2 == []
