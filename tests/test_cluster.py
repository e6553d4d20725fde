"""Sort-order rewrite (LakeTable.cluster): read-equivalence, pruning
selectivity, snapshot isolation, partitioned-table layout."""

import tempfile

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.format import CommitConflict, LakeTable, PartitionSpec


def _striped_table(spark, tmp, spec=None, stripes=5):
    """Append events in id-striped commits (event_id % stripes == i), so
    EVERY file spans the full event_id range — worst case for pruning."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    t = LakeTable.create(spark, tmp + "/t", events.schema, spec or PartitionSpec())
    for i in range(stripes):
        t.append(
            events.filter(F.col("event_id") % stripes == i),
            checkpoint_key=f"stripe-{i}",
            stat_cols=["event_id"],
        )
    return t, events


def test_cluster_read_equivalence_and_pruning(spark):
    tmp = tempfile.mkdtemp(prefix="cluster_")
    t, events = _striped_table(spark, tmp)
    rng = {"event_id": (100, 199)}

    before = sorted(map(tuple, t.read().collect()))
    kept_before = len(t.prune(rng))
    assert kept_before == len(t.files())  # striped layout: nothing prunable

    v = t.cluster(["event_id"], target_file_bytes=4 * 1024)
    assert t.manifest()["operation"] == "cluster"
    assert t.properties()["sort.order"] == "event_id"

    after = sorted(map(tuple, t.read().collect()))
    assert after == before  # pure layout change
    assert len(t.files()) > 1  # small target → several range files

    kept_after = len(t.prune(rng))
    assert kept_after < kept_before  # pruning is now selective
    got = sorted(r["event_id"] for r in t.read_where(rng).collect())
    want = sorted(
        r["event_id"]
        for r in events.filter(F.col("event_id").between(100, 199)).collect()
    )
    assert got == want

    # old snapshot still readable and identical
    assert sorted(map(tuple, t.read(version=v - 1).collect())) == before


def test_cluster_preserves_partition_values(spark):
    tmp = tempfile.mkdtemp(prefix="cluster_part_")
    spec = PartitionSpec.bucket("user_id", 4)
    t, events = _striped_table(spark, tmp, spec=spec, stripes=3)
    before = sorted(map(tuple, t.read().collect()))
    t.cluster(["event_id"], target_file_bytes=4 * 1024)
    assert sorted(map(tuple, t.read().collect())) == before
    # every rewritten file carries a partition tuple under the same spec
    assert all(e.partition for e in t.files())


def test_cluster_conflicts_with_concurrent_append(spark):
    tmp = tempfile.mkdtemp(prefix="cluster_conflict_")
    t, events = _striped_table(spark, tmp, stripes=2)
    # simulate: another writer lands a commit between cluster's read and commit
    t2 = LakeTable.load(spark, tmp + "/t")
    orig_stage = t.__class__._stage_write

    def race_stage(self, *a, **kw):
        entries = orig_stage(self, *a, **kw)
        if self is t and not getattr(t, "_raced", False):
            t._raced = True
            t2.append(events.limit(5), checkpoint_key="late", stat_cols=["event_id"])
        return entries

    t.__class__._stage_write = race_stage
    try:
        with pytest.raises(CommitConflict):
            t.cluster(["event_id"], target_file_bytes=4 * 1024)
    finally:
        t.__class__._stage_write = orig_stage
    # the concurrent append is intact
    assert "late" in t2.committed()


def test_zorder_cluster_prunes_on_both_columns(spark):
    """Lexicographic sort makes pruning selective on the FIRST column only;
    z-order must be selective on EACH column, at equal data."""
    tmp = tempfile.mkdtemp(prefix="zorder_")
    t, events = _striped_table(spark, tmp)
    # stats on both dims from here on
    # sf0.001 events: event_id 0-999, user_id 0-14 — keep each probe range
    # well under half its domain so per-file half-range coverage can prune
    rng_id = {"event_id": (100, 199)}
    rng_user = {"user_id": (0, 2)}

    before = sorted(map(tuple, t.read().collect()))
    v_lex = t.cluster(["event_id", "user_id"], target_file_bytes=2 * 1024)
    # re-stat with user_id included for a fair comparison
    lex_files = len(t.files())
    lex_kept_user = len(t.prune(rng_user))

    t.cluster(["event_id", "user_id"], target_file_bytes=2 * 1024, zorder=True)
    assert t.properties()["sort.order"] == "zorder(event_id,user_id)"
    assert sorted(map(tuple, t.read().collect())) == before  # layout-only

    n_files = len(t.files())
    assert n_files > 4
    kept_id = len(t.prune(rng_id))
    kept_user = len(t.prune(rng_user))
    # selective on BOTH dimensions (each range covers ~10-20% of its domain)
    assert kept_id < n_files
    assert kept_user < n_files
    # and strictly better than lexicographic on the second column
    assert kept_user / n_files < max(1.0, lex_kept_user) / lex_files

    # read_where correctness on the second column
    got = sorted(r["event_id"] for r in t.read_where(rng_user).collect())
    want = sorted(
        r["event_id"]
        for r in events.filter(F.col("user_id").between(0, 2)).collect()
    )
    assert got == want


def test_zorder_handles_nulls_and_degenerate_columns(spark):
    tmp = tempfile.mkdtemp(prefix="zorder_null_")
    rows = [(i, float(i % 7) if i % 11 else None, 1) for i in range(500)]
    df = spark.createDataFrame(rows, "a bigint, b double, c int")
    t = LakeTable.create(spark, tmp + "/t", df.schema, PartitionSpec())
    t.append(df, checkpoint_key="x", stat_cols=["a", "b", "c"])
    before = sorted(map(tuple, t.read().collect()))
    # c is constant → its buckets collapse; b has NULLs → bucket 0
    t.cluster(["a", "b", "c"], target_file_bytes=2 * 1024, zorder=True)
    assert sorted(map(tuple, t.read().collect())) == before
    got = sorted(r["a"] for r in t.read_where({"b": (1.0, 2.0)}).collect())
    want = sorted(
        r["a"] for r in df.filter(F.col("b").between(1.0, 2.0)).collect()
    )
    assert got == want
