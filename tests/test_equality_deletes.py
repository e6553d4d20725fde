"""Equality-delete files (≡ Iceberg v2 equality deletes).

delete_equality commits a key-tuple sidecar as pure metadata — O(|keys|)
regardless of table size, no data file read or rewritten. Reads apply it
only to data files whose data sequence number predates the delete, so a
later (re)insert of the same key survives — the strictly-lower-sequence
rule that makes metadata deletes safe under a live CDC stream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.dml import delete_equality
from airbyte_spark.lake.format import LakeTable, PartitionSpec


def _src(spark, sf_dir, n=400):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "event_type", "value")
        .limit(n)
    )


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    src = _src(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / "t"), src.schema, PartitionSpec())
    for i in range(3):
        t.append(
            src.filter(F.col("event_id") % 3 == i),
            checkpoint_key=f"ck-{i}",
            stat_cols=["event_id"],
        )
    return t, src


def test_metadata_only_delete_no_rewrite(spark, sf_dir, table):
    t, src = table
    files_before = {e.path for e in t.files()}
    victims = [r["event_id"] for r in src.filter("event_type = 'error'").collect()]
    res = delete_equality(t, victims, cols=["event_id"])
    assert res["keys"] == len(set(victims)) and res["eq_delete_files"] == 1
    # not a single data file touched
    assert {e.path for e in t.files()} == files_before
    got = {r["event_id"] for r in t.read().collect()}
    want = {r["event_id"] for r in src.filter("event_type <> 'error'").collect()}
    assert got == want


def test_sequence_rule_reinsert_survives(spark, sf_dir, table):
    t, src = table
    doomed = src.filter("user_id % 10 = 3")
    delete_equality(t, doomed.select("event_id"), cols=["event_id"])
    assert t.read().filter("user_id % 10 = 3").count() == 0
    # rows re-inserted AFTER the delete carry a higher sequence → visible
    reinsert = doomed.filter("event_id % 2 = 0")
    t.append(reinsert, checkpoint_key="reinsert")
    assert (
        t.read().filter("user_id % 10 = 3").count() == reinsert.count()
    ), "post-delete insert must not be swallowed by the equality delete"
    # and the pre-delete copies stay deleted (no duplicate revival)
    n_total = t.read().count()
    assert n_total == src.filter("user_id % 10 <> 3").count() + reinsert.count()


def test_composite_key_delete(spark, sf_dir, table):
    t, src = table
    keys = src.filter("event_type = 'view'").select("event_id", "user_id")
    delete_equality(t, keys)
    assert t.read().filter("event_type = 'view'").count() == 0
    assert t.read().count() == src.filter("event_type <> 'view'").count()


def test_compaction_materializes_and_drops_entry(spark, sf_dir, table):
    t, src = table
    delete_equality(t, src.select("event_id").limit(50), cols=["event_id"])
    before = t.read().count()
    assert len(t.eq_delete_files()) == 1
    t.compact(target_file_bytes=1 << 30)
    # every predating file was rewritten → entry dropped, contents unchanged
    assert t.eq_delete_files() == []
    assert t.read().count() == before
    # sidecar file is now unreferenced by the head → vacuum after expiry
    t.expire_snapshots(retain_last=1)
    assert t.vacuum() >= 1
    assert t.read().count() == before


def test_time_travel_and_rollback(spark, sf_dir, table):
    t, src = table
    v_before = t.current_version()
    n_before = t.read().count()
    delete_equality(t, src.select("event_id").limit(100), cols=["event_id"])
    n_after = t.read().count()
    assert n_after < n_before
    assert t.read(v_before).count() == n_before  # pre-delete snapshot intact
    t.rollback(v_before)
    assert t.read().count() == n_before
    # rolling FORWARD again (to the delete snapshot) also works
    t.rollback(v_before + 1)
    assert t.read().count() == n_after


def test_idempotent_redelivery(spark, sf_dir, table):
    t, src = table
    delete_equality(
        t, src.select("event_id").limit(10), cols=["event_id"], checkpoint_key="d-1"
    )
    v = t.current_version()
    res = delete_equality(
        t, src.select("event_id").limit(10), cols=["event_id"], checkpoint_key="d-1"
    )
    assert res["version"] == v and res["keys"] == 0
    assert t.current_version() == v


def test_merge_into_eq_deleted_table(spark, sf_dir, tmp_path):
    """The CDC merge path reads candidates through the eq-delete filter:
    a deleted key absent from the batch stays deleted; a batch upsert of a
    deleted key re-inserts it (new seq) — LWW semantics preserved."""
    from airbyte_spark.lake.merge import merge_upsert
    from airbyte_spark.protocol import StreamConfig
    from airbyte_spark.sources.changelog import derive_changelog
    from airbyte_spark.streaming.pipeline import default_target_schema

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    changelog = derive_changelog(events, batch_span=10**9).cache()
    cfg = StreamConfig(name="pages", schema=default_target_schema())
    t = LakeTable.create(
        spark,
        str(tmp_path / "pages"),
        default_target_schema(),
        PartitionSpec.bucket("url", 4),
    )
    merge_upsert(t, changelog, cfg, checkpoint_key="b-0")
    urls = [r["url"] for r in t.read().select("url").limit(3).collect()]
    delete_equality(t, urls[:2], cols=["url"])
    assert t.read().filter(F.col("url").isin(urls[:2])).count() == 0
    # redeliver the same changelog under a new key: the upserts re-insert
    merge_upsert(t, changelog, cfg, checkpoint_key="b-1")
    assert t.read().filter(F.col("url").isin(urls[:2])).count() == 2


def test_stats_summary_degrades_exact_or_absent(spark, sf_dir, table):
    t, src = table
    assert t.stats_summary()["rows"] == src.count()
    delete_equality(t, src.select("event_id").limit(5), cols=["event_id"])
    s = t.stats_summary()
    assert s["rows"] is None and s["columns"] == {}
    t.compact(target_file_bytes=1 << 30)
    assert t.stats_summary()["rows"] == t.read().count()


def test_fsck_missing_sidecar_detected(spark, sf_dir, table):
    import os

    t, src = table
    delete_equality(t, src.select("event_id").limit(5), cols=["event_id"])
    path = t.eq_delete_files()[0]["path"]
    assert not [i for i in t.fsck() if i["path"] == path]
    os.rename(t.path + "/" + path, t.path + "/" + path + ".bak")
    assert [i for i in t.fsck() if i["kind"] == "missing-file" and i["path"] == path]


def test_unknown_column_rejected(spark, sf_dir, table):
    t, _ = table
    with pytest.raises(ValueError, match="not in table schema"):
        delete_equality(t, [1, 2], cols=["nope"])


def test_rewrite_conflicts_with_concurrent_delete(spark, sf_dir, table, monkeypatch):
    """A rewrite (compact here) whose read predates a concurrently
    committed equality delete must CommitConflict instead of silently
    re-materializing the purged rows with a fresher sequence number."""
    from airbyte_spark.lake.format import CommitConflict, LakeTable

    t, src = table
    orig = LakeTable._stage_write
    fired = {"done": False}

    def staged_then_delete(self, *a, **kw):
        out = orig(self, *a, **kw)
        if not fired["done"]:
            fired["done"] = True  # delete lands between read+stage and commit
            delete_equality(t, src.select("event_id").limit(20), cols=["event_id"])
        return out

    monkeypatch.setattr(LakeTable, "_stage_write", staged_then_delete)
    with pytest.raises(CommitConflict, match="deletes committed"):
        t.compact(target_file_bytes=1 << 30)
    # the delete survived; a re-run against current state succeeds
    monkeypatch.setattr(LakeTable, "_stage_write", orig)
    n = t.read().count()
    t.compact(target_file_bytes=1 << 30)
    assert t.read().count() == n == src.count() - 20


def test_cluster_conflicts_with_concurrent_delete(spark, sf_dir, table, monkeypatch):
    from airbyte_spark.lake.format import CommitConflict, LakeTable

    t, src = table
    orig = LakeTable._stage_write
    fired = {"done": False}

    def staged_then_delete(self, *a, **kw):
        out = orig(self, *a, **kw)
        if not fired["done"]:
            fired["done"] = True
            delete_equality(t, src.select("event_id").limit(10), cols=["event_id"])
        return out

    monkeypatch.setattr(LakeTable, "_stage_write", staged_then_delete)
    with pytest.raises(CommitConflict, match="deletes committed"):
        t.cluster(["event_id"], target_file_bytes=1 << 30)
    assert t.read().count() == src.count() - 10  # delete intact


def test_rename_keeps_delete_applying_redadd_does_not(spark, sf_dir, table):
    """Equality deletes are keyed on field ids: a rename keeps them
    applying; dropping the key column disables (never mis-applies) them."""
    t, src = table
    delete_equality(t, src.filter("user_id % 10 = 3").select("user_id"))
    n_after = t.read().count()
    t.rename_column("user_id", "uid")
    assert t.read().count() == n_after  # still applies through the rename
    assert t.read().filter("uid % 10 = 3").count() == 0
    t.drop_column("uid")
    # key column gone → the delete can no longer identify rows; reads work
    # and conservatively keep everything still stored
    assert t.read().count() == src.count()


def test_list_value_cast_failure_rejected(spark, sf_dir, table):
    t, _ = table
    with pytest.raises(ValueError, match="do not cast"):
        delete_equality(t, ["12", "34abc"], cols=["event_id"])
    assert t.eq_delete_files() == []  # nothing committed


def test_change_feed_emits_equality_deletes(spark, sf_dir, table):
    """An equality-delete commit changes no data files, but the row-level
    change feed must still emit delete images for the vanished rows — and
    a rollback across it must emit them back as inserts."""
    from airbyte_spark.lake.changes import row_changes

    t, src = table
    t._update_properties({"bloom.key": "event_id"}, set(), "key-prop")
    v0 = t.current_version()
    doomed = src.filter("user_id % 10 = 3")
    delete_equality(t, doomed.select("event_id"), cols=["event_id"])
    v1 = t.current_version()

    ch = row_changes(t, v0, v1).collect()
    assert {r["_change_type"] for r in ch} == {"delete"}
    assert {r["event_id"] for r in ch} == {
        r["event_id"] for r in doomed.collect()
    }
    # rollback across the delete → the same rows come back as inserts
    t.rollback(v0)
    v2 = t.current_version()
    back = row_changes(t, v1, v2).collect()
    assert {r["_change_type"] for r in back} == {"insert"}
    assert {r["event_id"] for r in back} == {r["event_id"] for r in doomed.collect()}
    # and across the whole span nothing changed at all
    assert row_changes(t, v0, v2).count() == 0


def test_change_feed_eq_delete_skips_postdating_files(spark, sf_dir, table):
    """Rows (re)inserted after the delete carry a higher sequence: the
    change feed must not emit phantom deletes for them."""
    from airbyte_spark.lake.changes import row_changes

    t, src = table
    t._update_properties({"bloom.key": "event_id"}, set(), "key-prop")
    doomed = src.filter("user_id % 10 = 3")
    delete_equality(t, doomed.select("event_id"), cols=["event_id"])
    v1 = t.current_version()
    t.append(doomed.filter("event_id % 2 = 0"), checkpoint_key="reinsert")
    v2 = t.current_version()
    ch = row_changes(t, v1, v2).collect()
    # only the re-insert batch appears, as inserts riding the file diff
    assert {r["_change_type"] for r in ch} == {"insert"}
    assert len(ch) == doomed.filter("event_id % 2 = 0").count()


def test_change_feed_dual_covered_rows_emit_once(spark, sf_dir, table):
    """Regression: a row of a both-live file covered by BOTH a new
    position-delete sidecar and a new equality delete between the compared
    versions must emit exactly ONE delete event (each materializer reads
    at v_from without knowledge of the other new sidecar). Symmetrically,
    a rollback dropping both sidecars resurrects the row exactly once."""
    from airbyte_spark.lake.changes import row_changes
    from airbyte_spark.lake.dml import delete_positions

    t, src = table
    t._update_properties({"bloom.key": "event_id"}, set(), "key-prop")
    v0 = t.current_version()
    # positional sidecar over the 'error' rows (reads post-delete state,
    # so it must come first), then an equality delete over user_id%10=3 —
    # the two sets overlap on rows with both properties
    delete_positions(t, "event_type = 'error'")
    delete_equality(
        t, src.filter("user_id % 10 = 3").select("event_id"), cols=["event_id"]
    )
    v2 = t.current_version()
    doomed = {
        r["event_id"]
        for r in src.filter("event_type = 'error' OR user_id % 10 = 3").collect()
    }
    overlap = {
        r["event_id"]
        for r in src.filter("event_type = 'error' AND user_id % 10 = 3").collect()
    }
    assert overlap, "fixture must actually exercise the dual-coverage case"

    ch = row_changes(t, v0, v2).collect()
    assert {r["_change_type"] for r in ch} == {"delete"}
    ids = [r["event_id"] for r in ch]
    assert len(ids) == len(set(ids)), "duplicate delete events for dual-covered rows"
    assert set(ids) == doomed

    # rollback across both sidecars → every row back exactly once
    t.rollback(v0)
    back = row_changes(t, v2, t.current_version()).collect()
    assert {r["_change_type"] for r in back} == {"insert"}
    bids = [r["event_id"] for r in back]
    assert len(bids) == len(set(bids)) and set(bids) == doomed


def test_delete_broadcast_gate_fallback(spark, sf_dir, table, monkeypatch):
    """Forcing the sidecar-size gate to overflow must yield the identical
    read result with no forced broadcast hint in the logical plan (AQE
    decides from runtime sizes) — the mega-delete failure mode at 100x."""
    import airbyte_spark.lake.format as FMT
    from airbyte_spark.lake.dml import delete_positions

    t, src = table
    delete_positions(t, "event_type = 'error'")
    delete_equality(t, src.filter("user_id % 10 = 3").select("event_id"))
    want = sorted(r["event_id"] for r in t.read().collect())
    monkeypatch.setattr(FMT, "BROADCAST_DELETE_ROWS_MAX", 0)
    df = t.read()
    plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "strategy=broadcast" not in plan
    got = sorted(r["event_id"] for r in df.collect())
    assert got == want and want


def test_change_feed_broadcast_gate_fallback(spark, sf_dir, table, monkeypatch):
    """row_changes materializes dual-sidecar deletes via three joins
    against sidecar frames (position map, dv-overlap anti, equality keys).
    Forcing the manifest-row-count gate to overflow must drop every forced
    broadcast hint from the plan (AQE decides) while the emitted change
    set stays identical — the mega-delete failure mode at 100x."""
    import airbyte_spark.lake.format as FMT
    from airbyte_spark.lake.changes import row_changes
    from airbyte_spark.lake.dml import delete_positions

    t, src = table
    t._update_properties({"bloom.key": "event_id"}, set(), "key-prop")
    v0 = t.current_version()
    delete_positions(t, "event_type = 'error'")
    delete_equality(
        t, src.filter("user_id % 10 = 3").select("event_id"), cols=["event_id"]
    )
    v2 = t.current_version()
    want = sorted(
        (r["event_id"], r["_change_type"]) for r in row_changes(t, v0, v2).collect()
    )
    monkeypatch.setattr(FMT, "BROADCAST_DELETE_ROWS_MAX", 0)
    df = row_changes(t, v0, v2)
    plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "strategy=broadcast" not in plan
    got = sorted((r["event_id"], r["_change_type"]) for r in df.collect())
    assert got == want and want
