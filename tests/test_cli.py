"""CLI surface tests (≡ reference entrypoint spec/check/discover/read
acceptance, SourceAcceptanceTest.java:120-281) — run() invoked in-process
with the shared session."""

from __future__ import annotations

import argparse
import datetime as dt

import pytest

from airbyte_spark.cli import run
from airbyte_spark.sources.changelog import write_changelog_dir


@pytest.fixture(scope="module")
def changelog_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli") / "changelog")
    write_changelog_dir(spark, sf_dir, d, batch_span=500)
    return d


def ns(**kw):
    return argparse.Namespace(**kw)


def test_discover_default(spark, tmp_path):
    out = run(spark, ns(cmd="discover", target=str(tmp_path / "nope")))
    s = out["streams"][0]
    assert s["name"] == "pages"
    assert s["default_cursor_field"] == ["warc_ts"]
    assert s["source_defined_primary_key"] == [["url"]]
    names = [f["name"] for f in s["json_schema"]["fields"]]
    assert {"url", "warc_ts", "html", "text", "lang"} <= set(names)


def test_check_ok_and_fail(spark, changelog_dir, tmp_path):
    ok = run(spark, ns(cmd="check", source=changelog_dir))
    assert ok["status"] == "SUCCEEDED"
    bad = run(spark, ns(cmd="check", source=str(tmp_path / "missing")))
    assert bad["status"] == "FAILED"


def test_read_resume_reset(spark, changelog_dir, tmp_path):
    target = str(tmp_path / "pages")
    r1 = run(
        spark,
        ns(cmd="read", source=changelog_dir, target=target, from_checkpoint=None, n_buckets=4),
    )
    assert r1["applied"] == 2 and r1["skipped"] == 0
    r2 = run(
        spark,
        ns(cmd="read", source=changelog_dir, target=target, from_checkpoint=None, n_buckets=4),
    )
    assert r2["applied"] == 0 and r2["skipped"] == 2

    m = run(spark, ns(cmd="metrics", target=target))
    assert len(m["rows"]) == 2 and all(r["rows_written"] > 0 for r in m["rows"])

    rst = run(spark, ns(cmd="reset", target=target))
    assert rst["mode"] == "reset"
    from airbyte_spark.lake.format import LakeTable

    assert LakeTable.load(spark, target).read().count() == 0


def test_full_refresh_matches_incremental_active_rows(spark, changelog_dir, tmp_path):
    inc = str(tmp_path / "inc")
    fr = str(tmp_path / "fr")
    run(spark, ns(cmd="read", source=changelog_dir, target=inc, from_checkpoint=None, n_buckets=4))
    run(spark, ns(cmd="full-refresh", source=changelog_dir, target=fr, n_buckets=4))
    from airbyte_spark.streaming.pipeline import CdcPipeline

    cols = ["url", "warc_ts", "text", "lang", "_ab_cdc_lsn"]
    a = sorted(
        tuple(r[c] for c in cols)
        for r in CdcPipeline.create_target(spark, inc).final_state().select(cols).collect()
    )
    b = sorted(
        tuple(r[c] for c in cols)
        for r in CdcPipeline.create_target(spark, fr).final_state().select(cols).collect()
    )
    assert a == b and len(a) > 0


def test_expire_via_cli(spark, changelog_dir, tmp_path):
    target = str(tmp_path / "exp")
    run(spark, ns(cmd="read", source=changelog_dir, target=target, from_checkpoint=None, n_buckets=4))
    from airbyte_spark.streaming.pipeline import CdcPipeline

    pipe = CdcPipeline.create_target(spark, target)
    before_dead = pipe.raw_state().count() - pipe.final_state().count()
    assert before_dead > 0
    run(spark, ns(cmd="expire", target=target, watermark=str(dt.datetime(2030, 1, 1))))
    pipe2 = CdcPipeline.create_target(spark, target)
    assert pipe2.raw_state().count() == pipe2.final_state().count()


def test_curate_cmd(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs far into "
                "the green hills of the quiet countryside to rest in the shade"),
            (2, "x y z"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = run(
        spark,
        ns(cmd="curate", docs=src, out=str(tmp_path / "verdict"),
           min_quality=0.75, langs="en"),
    )
    assert out["type"] == "CURATE_RESULT"
    assert out["retained"] == 1 and out["rejected"] == 1
    got = spark.read.parquet(str(tmp_path / "verdict"))
    assert got.filter("retained").first()["doc_id"] == 1


def test_ingest_docs_cmd_exact_and_near(spark, tmp_path):
    text = ("a ship sailed slowly across the wide grey ocean while sailors "
            "watched the distant storm clouds gather above the cold waters")
    b1 = spark.createDataFrame([(1, text), (2, text + "!")], "doc_id long, text string")
    b2 = spark.createDataFrame([(3, text.upper())], "doc_id long, text string")
    s1, s2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    b1.write.parquet(s1)
    b2.write.parquet(s2)
    reg = str(tmp_path / "reg")
    out1 = run(spark, ns(cmd="ingest-docs", docs=s1, registry=reg,
                         checkpoint="k1", near=False, out=None, n_buckets=4))
    assert (out1["input"], out1["admitted"], out1["dropped"]) == (2, 1, 1)
    # batch 2 normalizes to batch-1 content → dropped against the registry
    out2 = run(spark, ns(cmd="ingest-docs", docs=s2, registry=reg,
                         checkpoint="k2", near=False, out=None, n_buckets=4))
    assert (out2["admitted"], out2["dropped"]) == (0, 1)
    # near mode over a fresh registry
    nreg = str(tmp_path / "nreg")
    outn = run(spark, ns(cmd="ingest-docs", docs=s1, registry=nreg,
                         checkpoint="k1", near=True, out=None, n_buckets=4))
    assert outn["mode"] == "near" and outn["admitted"] == 1


def test_maintenance_cmds(spark, tmp_path):
    import pyspark.sql.functions as FF

    from airbyte_spark.lake.format import LakeTable, PartitionSpec

    path = str(tmp_path / "t")
    df = spark.range(0, 200).select(FF.col("id").alias("k"))
    t = LakeTable.create(spark, path, df.schema, PartitionSpec.bucket("k", 2))
    for i in range(4):
        t.append(df.filter(FF.col("k") % 4 == i), checkpoint_key=f"c{i}")

    out = run(spark, ns(cmd="compact", target=path, target_file_mb=128))
    assert out["files_after"] < out["files_before"]
    out = run(spark, ns(cmd="respec", target=path, bucket_col="k", n_buckets=8))
    assert out["n_buckets"] == 8
    out = run(spark, ns(cmd="cluster", target=path, sort_cols="k", target_file_mb=128, zorder=False))
    assert out["sort_order"] == "k"
    v_before = LakeTable.load(spark, path).current_version()
    out = run(spark, ns(cmd="fsck", target=path))
    assert out["n_issues"] == 0
    out = run(spark, ns(cmd="rollback", target=path, to_version=v_before))
    assert out["restored"] == v_before
    out = run(spark, ns(cmd="vacuum", target=path, retain_last=1))
    assert out["files_removed"] > 0
    assert LakeTable.load(spark, path).read().count() == 200


def test_vacuum_default_preserves_expire_window(spark, tmp_path):
    """Default vacuum must align with expire-snapshots' default retention:
    after a default expire, a default vacuum may not delete data files
    still referenced by the retained manifests (time travel within the
    advertised window stays intact)."""
    import pyspark.sql.functions as FF

    from airbyte_spark.lake.format import LakeTable, PartitionSpec

    path = str(tmp_path / "t")
    df = spark.range(0, 120).select(FF.col("id").alias("k"))
    t = LakeTable.create(spark, path, df.schema, PartitionSpec())
    for i in range(6):
        t.append(df.filter(FF.col("k") % 6 == i), checkpoint_key=f"c{i}")
    # full-table rewrite so old files become vacuum-eligible below retention
    from airbyte_spark.lake.dml import replace_where

    replace_where(t, t.read(), "true")
    run(spark, ns(cmd="expire-snapshots", target=path, retain_last=10))
    out = run(spark, ns(cmd="vacuum", target=path))
    t = LakeTable.load(spark, path)
    # every retained manifest remains fully readable after a default vacuum
    for v in range(1, t.current_version() + 1):
        import os

        if os.path.exists(t._manifest_path(v)):
            assert t.read(version=v).count() >= 0  # no missing-file read error
    assert t.fsck() == [] or all(i["kind"] != "missing-file" for i in t.fsck())


def test_read_mor_and_compact_versions(spark, changelog_dir, tmp_path):
    from airbyte_spark.lake.format import LakeTable

    target = str(tmp_path / "pages_mor")
    r1 = run(
        spark,
        ns(cmd="read", source=changelog_dir, target=target, from_checkpoint=None,
           n_buckets=4, write_mode="mor"),
    )
    assert r1["applied"] == 2
    t = LakeTable.load(spark, target)
    assert t.properties().get("write.mode") == "mor"
    stored_before = t.read().count()
    out = run(spark, ns(cmd="compact-versions", target=target))
    assert out["rows_after"] <= out["rows_before"] == stored_before
    # resumed read over the compacted table is still exactly-once
    r2 = run(
        spark,
        ns(cmd="read", source=changelog_dir, target=target, from_checkpoint=None,
           n_buckets=4, write_mode="mor"),
    )
    assert r2["applied"] == 0 and r2["skipped"] == 2


def test_audit_cmd(spark, changelog_dir, tmp_path):
    target = str(tmp_path / "audited")
    run(spark, ns(cmd="read", source=changelog_dir, target=target,
                  from_checkpoint=None, n_buckets=4))
    out = run(spark, ns(cmd="audit", source=changelog_dir, target=target, limit=5))
    assert out["consistent"] and out["divergent_keys"] == 0

    # corrupt one row out-of-band (DML delete, no log event): the audit
    # must go red with exactly one typed diff
    import pyspark.sql.functions as F

    from airbyte_spark.lake.dml import delete_where
    from airbyte_spark.lake.format import LakeTable

    t = LakeTable.load(spark, target)
    victim = t.read().filter(F.col("_ab_cdc_deleted_at").isNull()).first()["url"]
    delete_where(t, F.col("url") == victim)
    out2 = run(spark, ns(cmd="audit", source=changelog_dir, target=target, limit=5))
    assert not out2["consistent"] and out2["by_verdict"] == {"missing": 1}
    assert out2["sample"][0]["url"] == victim


def test_spec_and_export_shards(spark, tmp_path, sf_dir):
    out = run(spark, ns(cmd="spec"))
    assert out["type"] == "SPEC"
    props = out["connectionSpecification"]["properties"]
    assert {"source", "target", "n_buckets", "write_mode"} <= set(props)

    shards = str(tmp_path / "shards")
    res = run(spark, ns(cmd="export-shards", docs=f"{sf_dir}/documents.parquet",
                        target=shards, max_tokens=256, n_shards=4))
    assert res["type"] == "EXPORT_RESULT" and len(res["shards"]) == 4
    assert spark.read.parquet(shards).count() > 0


def test_ingest_warc_cli(spark, tmp_path):
    import pyspark.sql.functions as F

    from airbyte_spark.sources.warc import write_warc

    pages = spark.range(20).select(
        F.concat(F.lit("https://c.example/"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.col("id")).cast("timestamp_ntz").alias("warc_ts"),
        F.encode(F.lit("<html>x</html>"), "UTF-8").alias("html"),
    )
    inbox = str(tmp_path / "inbox")
    write_warc(pages, inbox, n_shards=2)
    out = run(
        spark,
        ns(
            cmd="ingest-warc",
            warc_dir=inbox,
            target=str(tmp_path / "crawl"),
            spark_checkpoint=str(tmp_path / "sck"),
            n_buckets=4,
        ),
    )
    assert out["rows"] == 20 and out["mode"] == "warc"
    # rerun with a fresh spark checkpoint: exactly-once, version unchanged
    again = run(
        spark,
        ns(
            cmd="ingest-warc",
            warc_dir=inbox,
            target=str(tmp_path / "crawl"),
            spark_checkpoint=str(tmp_path / "sck2"),
            n_buckets=4,
        ),
    )
    assert again["version"] == out["version"] and again["rows"] == 20


def test_frontier_cmd(spark, changelog_dir, tmp_path):
    out_dir = str(tmp_path / "frontier")
    out = run(
        spark,
        ns(cmd="frontier", source=changelog_dir, budget=8, top=1000,
           out=out_dir, limit=3),
    )
    assert out["type"] == "FRONTIER" and 1 <= out["selected"] <= 8
    assert len(out["head"]) <= 3
    # the full pick set is materialized for a fetcher fleet to consume
    picks = spark.read.parquet(out_dir)
    assert picks.count() == out["selected"]
    assert {"domain", "url", "priority", "slot", "quota"} <= set(picks.columns)


def test_constraint_cmd(spark, tmp_path):
    from airbyte_spark.lake.format import LakeTable, PartitionSpec

    path = str(tmp_path / "ct")
    t = LakeTable.create(
        spark, path,
        spark.createDataFrame([], "id long, v long").schema, PartitionSpec(),
    )
    t.append(spark.createDataFrame([(1, 5)], "id long, v long"))
    out = run(spark, ns(cmd="constraint", target=path, add=["v_pos", "v > 0"], drop=None))
    assert out["constraints"] == {"v_pos": "v > 0"}
    # add that existing rows violate -> FAILED, not raised
    out = run(spark, ns(cmd="constraint", target=path, add=["v_big", "v > 100"], drop=None))
    assert out["status"] == "FAILED"
    out = run(spark, ns(cmd="constraint", target=path, add=None, drop=None))
    assert out["constraints"] == {"v_pos": "v > 0"}
    out = run(spark, ns(cmd="constraint", target=path, add=None, drop="v_pos"))
    assert out["constraints"] == {}
