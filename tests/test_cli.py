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
