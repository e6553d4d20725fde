"""Snapshot tags (≡ Iceberg tags): named, retention-exempt refs.

A tag pins "the exact corpus training run X saw" under a stable name:
reads resolve it like a version, and expire_snapshots/vacuum leave the
tagged snapshot's manifest and files alone until the tag is dropped —
reproducibility survives routine retention. The expired-version ledger in
refs.json lets fsck tell a legal retention gap (including the mid-chain
islands tags create) from genuine chain corruption.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from airbyte_spark.lake.format import LakeTable, PartitionSpec


def _src(spark, sf_dir, n=120):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "event_type", "value")
        .limit(n)
    )


def _build(spark, sf_dir, tmp_path, name):
    src = _src(spark, sf_dir)
    t = LakeTable.create(spark, str(tmp_path / name), src.schema, PartitionSpec())
    for i in range(6):
        t.append(src.filter(F.col("event_id") % 6 == i), checkpoint_key=f"ck-{i}")
    return t, src


def test_read_by_tag_name(spark, sf_dir, tmp_path):
    t, src = _build(spark, sf_dir, tmp_path, "t")
    mid_v = t.current_version() - 3
    n_mid = t.read(mid_v).count()
    t.tag("train-v1", mid_v)
    assert t.tags() == {"train-v1": mid_v}
    assert t.read("train-v1").count() == n_mid
    assert t.read().count() > n_mid  # head unaffected
    with pytest.raises(KeyError):
        t.read("no-such-tag")


def test_tag_survives_expiry_and_vacuum(spark, sf_dir, tmp_path):
    t, src = _build(spark, sf_dir, tmp_path, "t2")
    mid_v = t.current_version() - 3
    n_mid = t.read(mid_v).count()
    t.tag("train-v1", mid_v)
    # overwrite makes every old file unreferenced by the head
    t.overwrite(src.filter("event_id % 2 = 0"))
    t.expire_snapshots(retain_last=1)
    t.vacuum(retain_last=1)
    # tagged snapshot still fully readable: manifest AND data files kept
    assert t.read("train-v1").count() == n_mid
    # untagged old versions are gone
    with pytest.raises(FileNotFoundError):
        t.read(mid_v - 1)
    # the mid-chain island is a LEGAL gap to fsck (expired ledger)
    assert [i for i in t.fsck() if i["kind"] == "broken-chain"] == []
    # rollback to a tag works (manifest + files retained)
    t.rollback(mid_v)
    assert t.read().count() == n_mid


def test_drop_tag_releases_retention(spark, sf_dir, tmp_path):
    t, src = _build(spark, sf_dir, tmp_path, "t3")
    mid_v = t.current_version() - 3
    t.tag("tmp-pin", mid_v)
    t.expire_snapshots(retain_last=1)
    assert os.path.exists(os.path.join(t.path, "_lake", f"v{mid_v:09d}.json"))
    t.drop_tag("tmp-pin")
    assert t.expire_snapshots(retain_last=1) == 1  # the island goes now
    assert not os.path.exists(os.path.join(t.path, "_lake", f"v{mid_v:09d}.json"))
    assert [i for i in t.fsck() if i["kind"] == "broken-chain"] == []


def test_tag_cli(spark, sf_dir, tmp_path):
    from airbyte_spark import cli

    t, _ = _build(spark, sf_dir, tmp_path, "t4")
    args = cli._parser().parse_args(["tag", "--target", t.path, "--name", "rc-1"])
    out = cli.run(spark, args)
    assert out["tags"] == {"rc-1": t.current_version()}
    args = cli._parser().parse_args(
        ["tag", "--target", t.path, "--name", "rc-1", "--drop"]
    )
    assert cli.run(spark, args)["tags"] == {}


def test_tag_unknown_version_rejected(spark, sf_dir, tmp_path):
    t, _ = _build(spark, sf_dir, tmp_path, "t5")
    with pytest.raises(FileNotFoundError):
        t.tag("ghost", t.current_version() + 10)
