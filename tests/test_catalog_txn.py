"""Multi-table catalog transactions: atomicity, conflicts, crash recovery."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.format import LakeTable, PartitionSpec
from airbyte_spark.lake.transaction import (
    CatalogTransaction,
    TransactionAborted,
    _acquire,
    recover,
)


def _mk_tables(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    pa, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    ta = LakeTable.create(spark, pa, df.schema, PartitionSpec())
    tb = LakeTable.create(spark, pb, df.schema, PartitionSpec())
    ta.append(df, checkpoint_key="seed-a")
    tb.append(df, checkpoint_key="seed-b")
    return pa, pb, df


def test_commit_publishes_all_or_nothing(spark, tmp_path):
    pa, pb, df = _mk_tables(spark, tmp_path)
    log = str(tmp_path / "log")
    txn = CatalogTransaction.begin(spark, log, {"a": pa, "b": pb})
    txn.table("a").append(df.withColumn("k", F.col("k") + 100), checkpoint_key="x-a")
    txn.table("b").append(df.withColumn("k", F.col("k") + 100), checkpoint_key="x-b")
    # invisible while staged
    assert LakeTable.load(spark, pa).read().count() == 10
    assert LakeTable.load(spark, pb).read().count() == 10
    versions = txn.commit()
    assert set(versions) == {"a", "b"}
    assert LakeTable.load(spark, pa).read().count() == 20
    assert LakeTable.load(spark, pb).read().count() == 20
    # decision record reached terminal state; locks released
    rec = json.load(open(os.path.join(log, f"txn-{txn.txn_id}.json")))
    assert rec["status"] == "done" and rec["versions"]
    assert not os.path.isdir(os.path.join(pa, "_lake", "txn.lock"))


def test_abort_leaves_no_trace(spark, tmp_path):
    pa, pb, df = _mk_tables(spark, tmp_path)
    txn = CatalogTransaction.begin(spark, str(tmp_path / "log"), {"a": pa, "b": pb})
    txn.table("a").append(df, checkpoint_key="x-a")
    va = LakeTable.load(spark, pa).current_version()
    txn.abort()
    assert LakeTable.load(spark, pa).current_version() == va
    assert LakeTable.load(spark, pa).branches() == []
    with pytest.raises(ValueError, match="finished"):
        txn.table("a")


def test_external_write_aborts_whole_txn(spark, tmp_path):
    pa, pb, df = _mk_tables(spark, tmp_path)
    txn = CatalogTransaction.begin(spark, str(tmp_path / "log"), {"a": pa, "b": pb})
    txn.table("a").append(df, checkpoint_key="x-a")
    txn.table("b").append(df, checkpoint_key="x-b")
    # a non-transactional writer slips a commit onto b's main
    LakeTable.load(spark, pb).append(df, checkpoint_key="external")
    with pytest.raises(TransactionAborted, match="advanced"):
        txn.commit()
    # table a (whose own fast-forward was fine) must NOT have published
    assert LakeTable.load(spark, pa).read().count() == 10
    assert LakeTable.load(spark, pa).branches() == []
    assert LakeTable.load(spark, pb).branches() == []


def test_lock_held_by_other_txn_aborts(spark, tmp_path):
    pa, pb, df = _mk_tables(spark, tmp_path)
    txn = CatalogTransaction.begin(spark, str(tmp_path / "log"), {"a": pa, "b": pb})
    txn.table("a").append(df, checkpoint_key="x-a")
    _acquire(pb, "someone-else")
    with pytest.raises(TransactionAborted, match="locked"):
        txn.commit()
    # the foreign lock is untouched; ours were released
    assert open(os.path.join(pb, "_lake", "txn.lock", "owner")).read() == "someone-else"
    assert not os.path.isdir(os.path.join(pa, "_lake", "txn.lock"))


def test_consistent_reads_pin_the_txn_snapshot(spark, tmp_path):
    from airbyte_spark.lake.transaction import consistent_versions, read_consistent

    pa, pb, df = _mk_tables(spark, tmp_path)
    log = str(tmp_path / "log")
    txn = CatalogTransaction.begin(spark, log, {"a": pa, "b": pb})
    txn.table("a").append(df, checkpoint_key="x-a")
    txn.table("b").append(df, checkpoint_key="x-b")
    versions = txn.commit()
    # a non-transactional writer advances table a past the snapshot
    LakeTable.load(spark, pa).append(df, checkpoint_key="later")
    assert LakeTable.load(spark, pa).read().count() == 30  # HEAD moved on
    pinned = consistent_versions(log)
    assert {n: v for n, (_, v) in pinned.items()} == versions
    assert read_consistent(spark, log, "a").count() == 20  # snapshot, not HEAD
    assert read_consistent(spark, log, "b").count() == 20
    with pytest.raises(KeyError):
        read_consistent(spark, log, "nope")


def test_ddl_inside_transaction_publishes_atomically(spark, tmp_path):
    """Schema evolution staged on a txn branch must reach main only at
    commit, together with the other table's data."""
    import pyspark.sql.functions as F2

    pa, pb, df = _mk_tables(spark, tmp_path)
    txn = CatalogTransaction.begin(spark, str(tmp_path / "log"), {"a": pa, "b": pb})
    ba = txn.table("a")
    evolved = df.withColumn("w", F2.lit("x"))
    ba.evolve_schema(evolved.schema)
    ba.append(evolved, checkpoint_key="ddl-a")
    txn.table("b").append(df, checkpoint_key="x-b")
    # main still has the old schema while staged
    assert "w" not in LakeTable.load(spark, pa).read().columns
    txn.commit()
    ta = LakeTable.load(spark, pa)
    assert "w" in ta.read().columns
    assert ta.read().filter(F2.col("w").isNull()).count() == 10  # old gen NULL-filled
    assert LakeTable.load(spark, pb).read().count() == 20


def test_crash_after_decision_rolls_forward(spark, tmp_path):
    pa, pb, df = _mk_tables(spark, tmp_path)
    log = str(tmp_path / "log")
    txn = CatalogTransaction.begin(spark, log, {"a": pa, "b": pb})
    txn.table("a").append(df.withColumn("v", F.lit(1)), checkpoint_key="x-a")
    txn.table("b").append(df.withColumn("v", F.lit(1)), checkpoint_key="x-b")
    # hand-write the decision record (≡ crash immediately after commit point)
    entries = [
        {"name": n, "path": p, "base": LakeTable.load(spark, p).current_version()}
        for n, p in sorted(txn.tables.items(), key=lambda kv: kv[1])
    ]
    rec = {
        "txn_id": txn.txn_id,
        "branch": txn._branch_name,
        "tables": entries,
        "status": "committed",
    }
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"txn-{txn.txn_id}.json"), "w") as fh:
        json.dump(rec, fh)
    # crash scenario: one table already published before the crash
    LakeTable.load(spark, pa).publish_branch(txn._branch_name)
    assert LakeTable.load(spark, pa).read().count() == 20
    assert LakeTable.load(spark, pb).read().count() == 10  # torn state
    repaired = recover(spark, log)
    assert txn.txn_id in repaired and set(repaired[txn.txn_id]) == {"a", "b"}
    assert LakeTable.load(spark, pb).read().count() == 20
    # second recover is a no-op (record now terminal)
    assert recover(spark, log) == {}


def test_recover_completes_despite_later_commits(spark, tmp_path):
    """A commit landing AFTER a partial publish must not defeat the
    roll-forward idempotency check (it inspects manifest(base+1), not
    the moved head)."""
    pa, pb, df = _mk_tables(spark, tmp_path)
    log = str(tmp_path / "log")
    txn = CatalogTransaction.begin(spark, log, {"a": pa, "b": pb})
    txn.table("a").append(df.withColumn("v", F.lit(1)), checkpoint_key="y-a")
    txn.table("b").append(df.withColumn("v", F.lit(1)), checkpoint_key="y-b")
    entries = [
        {"name": n, "path": p, "base": LakeTable.load(spark, p).current_version()}
        for n, p in sorted(txn.tables.items(), key=lambda kv: kv[1])
    ]
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"txn-{txn.txn_id}.json"), "w") as fh:
        json.dump(
            {"txn_id": txn.txn_id, "branch": txn._branch_name,
             "tables": entries, "status": "committed"},
            fh,
        )
    # crash after publishing a; then a REGULAR writer advances a further
    LakeTable.load(spark, pa).publish_branch(txn._branch_name)
    LakeTable.load(spark, pa).append(df.limit(1), checkpoint_key="later")
    repaired = recover(spark, log)
    assert txn.txn_id in repaired
    assert LakeTable.load(spark, pb).read().count() == 20  # b completed


def test_recover_scavenges_undecided_crash(spark, tmp_path):
    """Crash BEFORE the decision record: the dead owner's locks and staged
    branches are scavenged so the tables become transactable again."""
    from airbyte_spark.lake.transaction import _acquire

    pa, pb, df = _mk_tables(spark, tmp_path)
    log = str(tmp_path / "log")
    dead = CatalogTransaction.begin(spark, log, {"a": pa, "b": pb})
    dead.table("a").append(df.withColumn("v", F.lit(9)))
    _acquire(pa, dead.txn_id)  # crash while holding a's lock, pre-decision

    # without recovery, a new transaction cannot lock table a
    t2 = CatalogTransaction.begin(spark, log, {"a": pa})
    with pytest.raises(TransactionAborted, match="locked"):
        t2.commit()

    recover(spark, log, table_paths=[pa, pb])
    assert dead._branch_name not in LakeTable.load(spark, pa).branches()
    # a fresh transaction now succeeds end-to-end
    t3 = CatalogTransaction.begin(spark, log, {"a": pa, "b": pb})
    t3.table("a").append(df.withColumn("v", F.lit(2)), checkpoint_key="z-a")
    t3.table("b").append(df.withColumn("v", F.lit(2)), checkpoint_key="z-b")
    versions = t3.commit()
    assert set(versions) == {"a", "b"}


def test_recover_scavenges_ownerless_lock(spark, tmp_path):
    """Crash between lock mkdir and owner write: the ownerless dir can
    never be released via the API — recover removes it directly."""
    pa, pb, df = _mk_tables(spark, tmp_path)
    log = str(tmp_path / "log")
    os.makedirs(os.path.join(pa, "_lake", "txn.lock"))  # no owner file
    recover(spark, log, table_paths=[pa])
    t = CatalogTransaction.begin(spark, log, {"a": pa})
    t.table("a").append(df.withColumn("v", F.lit(3)), checkpoint_key="w-a")
    assert set(t.commit()) == {"a"}
