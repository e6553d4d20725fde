"""WARC container source: spec shape, determinism, round-trip, registry."""

from __future__ import annotations

import glob
import gzip
import os
import tempfile

import pyspark.sql.functions as F
import pytest

from airbyte_spark.sources.warc import (
    _warc_record_bytes,
    parse_warc_members,
    read_warc,
    write_warc,
)


def _pages(spark, n=50):
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("https://t.example/"), F.col("id").cast("string")).alias(
                "url"
            ),
            F.timestamp_seconds(F.col("id") * 3600).cast("timestamp_ntz").alias(
                "warc_ts"
            ),
            F.encode(
                F.concat(F.lit("<html><body>pg "), F.col("id").cast("string"),
                         F.lit(" é中</body></html>")),
                "UTF-8",
            ).alias("html"),
        )
    )


def test_record_bytes_spec_shape():
    rec = _warc_record_bytes(
        "https://t.example/1", "2024-01-01T00:00:00Z", b"<html>x</html>", "rid1"
    )
    assert rec.startswith(b"WARC/1.0\r\n")
    head = rec.split(b"\r\n\r\n")[0]
    for field in (
        b"WARC-Type: response",
        b"WARC-Record-ID: <urn:uuid:rid1>",
        b"WARC-Date: 2024-01-01T00:00:00Z",
        b"WARC-Target-URI: https://t.example/1",
        b"Content-Length: ",
    ):
        assert field in head, field
    assert rec.endswith(b"\r\n\r\n")
    (parsed,) = parse_warc_members(rec)
    assert parsed["url"] == "https://t.example/1"
    assert parsed["html"] == b"<html>x</html>"


def test_parser_skips_non_response_records():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:w0>\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    rec = _warc_record_bytes("https://t.example/2", "2024-01-01T00:00:00Z", b"hi", "r2")
    out = list(parse_warc_members(info + rec))
    assert [r["url"] for r in out] == ["https://t.example/2"]


def test_parser_rejects_garbage():
    with pytest.raises(ValueError, match="version line"):
        list(parse_warc_members(b"NOT-A-WARC\r\n\r\nxx"))


def test_write_is_member_per_record_gzip_and_deterministic(spark):
    pages = _pages(spark, 30)
    base = tempfile.mkdtemp(prefix="warc_det_")
    write_warc(pages, base + "/a", n_shards=4)
    write_warc(pages, base + "/b", n_shards=4)
    a = sorted(glob.glob(base + "/a/*.warc.gz"))
    b = sorted(glob.glob(base + "/b/*.warc.gz"))
    assert len(a) == 4 and not glob.glob(base + "/a/*.inprogress")
    total_members = 0
    for fa, fb in zip(a, b):
        ba, bb = open(fa, "rb").read(), open(fb, "rb").read()
        assert ba == bb, "shard bytes must be replay-stable"
        # member-per-record: count gzip magic at member starts via GzipFile
        # member iteration (decompress-one-member-at-a-time)
        import io

        members = 0
        stream = io.BytesIO(ba)
        while True:
            g = gzip.GzipFile(fileobj=stream)
            try:
                g.read()
            except EOFError:
                break
            members += 1
            break  # GzipFile consumes ALL members; fall back to magic scan
        total_members += ba.count(b"\x1f\x8b\x08")
    assert total_members == 30, "one gzip member per record"


def test_roundtrip_distributed(spark):
    pages = _pages(spark, 57)
    base = tempfile.mkdtemp(prefix="warc_rt_") + "/seg"
    write_warc(pages, base, n_shards=3)
    back = read_warc(spark, base + "/*.warc.gz")
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]), r["content_length"])
        for r in back.collect()
    }
    want = {r["url"]: (r["warc_ts"], bytes(r["html"])) for r in pages.collect()}
    assert set(got) == set(want)
    for url, (ts, html) in want.items():
        bts, bhtml, clen = got[url]
        assert bhtml == html, url
        assert bts == ts, url
        assert clen > len(html)  # includes the HTTP envelope
    files = {os.path.basename(r["warc_file"]) for r in back.collect()}
    assert len(files) == 3


def test_cdx_index_offsets_are_exact(spark):
    import pyarrow.parquet as pq

    pages = _pages(spark, 20)
    base = tempfile.mkdtemp(prefix="warc_cdx_") + "/seg"
    write_warc(pages, base, n_shards=2, index=True)
    for ipath in sorted(glob.glob(base + "/*.cdx.parquet")):
        idx = pq.read_table(ipath).to_pylist()
        fname = idx[0]["warc_file"]
        blob = open(os.path.join(base, fname), "rb").read()
        covered = 0
        for row in idx:
            member = blob[row["offset"] : row["offset"] + row["length"]]
            (rec,) = parse_warc_members(member, fname)
            assert rec["url"] == row["url"]
            covered += row["length"]
        assert covered == len(blob), "members must tile the file exactly"


def test_indexed_point_lookup_and_range_split(spark):
    from airbyte_spark.sources.warc import read_warc_indexed

    pages = _pages(spark, 40)
    base = tempfile.mkdtemp(prefix="warc_pt_") + "/seg"
    write_warc(pages, base, n_shards=2, index=True)
    want_urls = [f"https://t.example/{i}" for i in (0, 7, 33)]
    urls_df = spark.createDataFrame([(u,) for u in want_urls], ["url"])
    got = read_warc_indexed(spark, base, urls=urls_df).collect()
    assert sorted(r["url"] for r in got) == sorted(want_urls)
    for r in got:
        assert f"pg {r['url'].rsplit('/', 1)[1]} " in bytes(r["html"]).decode()
    # range-split full read == whole-file read, despite only 2 files
    full = read_warc_indexed(spark, base, tasks=16)
    byfile = read_warc(spark, base + "/*.warc.gz")
    a = {(r["url"], bytes(r["html"])) for r in full.collect()}
    b = {(r["url"], bytes(r["html"])) for r in byfile.collect()}
    assert a == b and len(a) == 40


def test_revisit_record_shape_and_parse():
    from airbyte_spark.sources.warc import payload_digest

    rec = _warc_record_bytes(
        "https://t.example/1", "2024-01-02T00:00:00Z", b"<html>same</html>",
        "r1", revisit=True,
    )
    head = rec.split(b"\r\n\r\n")[0]
    assert b"WARC-Type: revisit" in head
    assert b"identical-payload-digest" in head
    assert b"Content-Length: 0" in head  # no body stored
    (parsed,) = parse_warc_members(rec)
    assert parsed["is_revisit"] is True
    assert parsed["html"] is None
    assert parsed["payload_digest"] == payload_digest(b"<html>same</html>")


def test_revisit_dedup_shrinks_storage_and_resolves(spark):
    from airbyte_spark.sources.warc import payload_digest_expr, resolve_revisits

    import pyspark.sql.functions as F2

    def big_pages():
        # ~2 KiB semi-random bodies so body bytes dominate record headers
        # 16 distinct per-url hashes -> ~2 KiB that gzip cannot collapse
        chunks = [
            F2.sha2(F2.concat(F2.col("url"), F2.lit(str(i))), 512)
            for i in range(16)
        ]
        return _pages(spark, 30).withColumn(
            "html",
            F2.encode(
                F2.concat(F2.decode(F2.col("html"), "UTF-8"), *chunks), "UTF-8"
            ),
        )

    crawl0 = big_pages()
    base = tempfile.mkdtemp(prefix="warc_rv_")
    write_warc(crawl0, base + "/c0", n_shards=2)
    pages0 = read_warc(spark, base + "/c0/*.warc.gz")

    # recrawl: ids %3==0 changed, the rest byte-identical
    crawl1 = big_pages().withColumn(
        "html",
        F2.when(
            F2.expr("CAST(split(url, '/')[3] AS BIGINT) % 3 = 0"),
            F2.encode(F2.lit("<html>changed</html>"), "UTF-8"),
        ).otherwise(F2.col("html")),
    ).withColumn("warc_ts", F2.expr("warc_ts + INTERVAL 1 DAY"))
    # full second crawl vs revisit-deduped second crawl
    write_warc(crawl1, base + "/c1full", n_shards=2)
    write_warc(
        crawl1, base + "/c1", n_shards=2,
        revisit_digests=pages0.select(F2.col("payload_digest")),
    )
    size = lambda d: sum(os.path.getsize(p) for p in glob.glob(d + "/*.warc.gz"))  # noqa: E731
    assert size(base + "/c1") < 0.7 * size(base + "/c1full")

    pages1 = read_warc(spark, base + "/c1/*.warc.gz")
    assert pages1.filter("is_revisit").count() == 20
    assert pages1.filter("is_revisit AND html IS NOT NULL").count() == 0
    resolved = resolve_revisits(pages1, pages0)
    assert resolved.filter("html IS NULL").count() == 0
    got = {r["url"]: bytes(r["html"]) for r in resolved.collect()}
    want = {r["url"]: bytes(r["html"]) for r in crawl1.collect()}
    assert got == want  # byte-identical reconstruction

    # digest absent from the store -> html stays NULL (broken-archive signal)
    resolved_empty = resolve_revisits(pages1, pages0.limit(0))
    assert resolved_empty.filter("html IS NULL").count() == 20


def _corrupt_one_member(path):
    """Flip bytes inside the SECOND gzip member of a shard; returns its offset."""
    blob = bytearray(open(path, "rb").read())
    first = blob.find(b"\x1f\x8b\x08", 1)
    assert first > 0, "need >=2 members"
    # damage the member body (past its 10-byte header so magic scan resyncs)
    for i in range(first + 12, first + 20):
        blob[i] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    return first


def test_corrupt_member_skip_and_quarantine(spark):
    from airbyte_spark.sources.warc import warc_quarantine

    pages = _pages(spark, 24)
    base = tempfile.mkdtemp(prefix="warc_bad_") + "/seg"
    write_warc(pages, base, n_shards=1)
    shard = glob.glob(base + "/*.warc.gz")[0]
    _corrupt_one_member(shard)
    # strict mode: the job fails loudly
    with pytest.raises(Exception, match="corrupt gzip member"):
        read_warc(spark, base + "/*.warc.gz").collect()
    # skip mode: exactly one record lost, the rest recovered via resync
    got = read_warc(spark, base + "/*.warc.gz", on_error="skip").collect()
    assert len(got) == 23
    q = warc_quarantine(spark, base + "/*.warc.gz").collect()
    assert len(q) == 1
    assert "corrupt gzip member" in q[0]["error"]
    assert q[0]["offset"] > 0
    # a clean segment quarantines nothing
    clean = tempfile.mkdtemp(prefix="warc_ok_") + "/seg"
    write_warc(pages, clean, n_shards=2)
    assert warc_quarantine(spark, clean + "/*.warc.gz").count() == 0


def test_plain_warc_garbage_quarantined():
    rec = _warc_record_bytes("https://t.example/9", "2024-01-01T00:00:00Z", b"ok", "r9")
    out = list(parse_warc_members(rec + b"GARBAGE-NO-VERSION\r\n\r\nxx",
                                  "f", on_error="skip"))
    good = [r for r in out if "_error" not in r]
    bad = [r for r in out if "_error" in r]
    assert [r["url"] for r in good] == ["https://t.example/9"]
    assert len(bad) == 1 and "version line" in bad[0]["_error"]


def test_stream_warc_ingest_exactly_once_lww(spark, tmp_path):
    """Crawl shards land as files; the stream merges each exactly once,
    recrawls win by WARC-Date, and losing the Spark checkpoint dir does
    not double-apply (committed set is in the table manifest)."""
    import shutil

    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    from airbyte_spark.lake.format import LakeTable, PartitionSpec
    from airbyte_spark.protocol import StreamConfig
    from airbyte_spark.sources.warc import stream_warc_ingest

    target = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampNTZType(), True),
            StructField("html", BinaryType(), True),
            StructField("_ab_cdc_lsn", LongType(), True),
            StructField("_ab_cdc_deleted_at", TimestampNTZType(), True),
        ]
    )
    cfg = StreamConfig(name="crawl", schema=target, primary_key=["url"])
    tpath = str(tmp_path / "crawl")
    t = LakeTable.create(spark, tpath, target, PartitionSpec.bucket("url", 4))
    wdir, ckpt = str(tmp_path / "inbox"), str(tmp_path / "sck")
    os.makedirs(wdir)

    write_warc(_pages(spark, 30), wdir, n_shards=2)
    stream_warc_ingest(t, cfg, wdir, ckpt)
    assert t.read().count() == 30
    v1 = t.current_version()

    # recrawl of ids 0..9 a day later, new body — lands as new shard files
    recrawl = spark.range(10).select(
        F.concat(F.lit("https://t.example/"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.col("id") * 3600 + 86400).cast("timestamp_ntz").alias("warc_ts"),
        F.encode(F.lit("<html>rev2</html>"), "UTF-8").alias("html"),
    )
    sub = str(tmp_path / "re")
    write_warc(recrawl, sub, n_shards=1)
    shutil.move(os.path.join(sub, "shard-0000.warc.gz"),
                os.path.join(wdir, "recrawl-0000.warc.gz"))
    stream_warc_ingest(t, cfg, wdir, ckpt)
    rows = {r["url"]: bytes(r["html"]) for r in t.read().collect()}
    assert len(rows) == 30
    assert rows["https://t.example/3"] == b"<html>rev2</html>"
    assert b"pg 15 " in rows["https://t.example/15"]

    # lost Spark checkpoint: rerun from scratch -> table version unchanged
    v2 = t.current_version()
    assert v2 > v1
    shutil.rmtree(ckpt)
    stream_warc_ingest(t, cfg, wdir, str(tmp_path / "sck2"))
    assert t.current_version() == v2


def test_warc_registry_source_envelope(spark):
    from airbyte_spark.sources.registry import source_factory

    pages = _pages(spark, 12)
    base = tempfile.mkdtemp(prefix="warc_src_") + "/seg"
    write_warc(pages, base, n_shards=2)
    src = source_factory("warc")(base + "/*.warc.gz", n_checkpoints=4)
    df = src(spark, {})
    cols = set(df.columns)
    assert {"_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
            "checkpoint_id", "url", "html"} <= cols
    rows = df.collect()
    lsns = [r["_ab_cdc_lsn"] for r in rows]
    assert len(set(lsns)) == 12, "lsn must be unique per record"
    assert all(0 <= r["checkpoint_id"] < 4 for r in rows)
    # deterministic across reads (replay stability)
    again = {r["url"]: r["_ab_cdc_lsn"] for r in src(spark, {}).collect()}
    assert again == {r["url"]: r["_ab_cdc_lsn"] for r in rows}


def test_stream_ingest_revisits_preserve_stored_bodies(spark, tmp_path):
    """Crawl 2 re-fetches unchanged pages as REVISIT records (no body).
    Ingesting them must not null out the stored html via LWW: bodies
    resolve from the table's stored pages, and the revisit's newer
    warc_ts wins with the body intact."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    import pyspark.sql.functions as F2

    from airbyte_spark.lake.format import LakeTable, PartitionSpec
    from airbyte_spark.protocol import StreamConfig
    from airbyte_spark.sources.warc import stream_warc_ingest

    target = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampNTZType(), True),
            StructField("html", BinaryType(), True),
            StructField("_ab_cdc_lsn", LongType(), True),
            StructField("_ab_cdc_deleted_at", TimestampNTZType(), True),
        ]
    )
    cfg = StreamConfig(name="crawl", schema=target, primary_key=["url"])
    t = LakeTable.create(
        spark, str(tmp_path / "rv"), target, PartitionSpec.bucket("url", 4)
    )
    wdir, ckpt = str(tmp_path / "inbox"), str(tmp_path / "sck")
    os.makedirs(wdir)

    crawl1 = _pages(spark, 12)
    write_warc(crawl1, wdir, n_shards=1)
    stream_warc_ingest(t, cfg, wdir, ckpt)
    before = {r["url"]: (bytes(r["html"]), r["warc_ts"]) for r in t.read().collect()}
    assert len(before) == 12

    # crawl 2 a day later: same bodies -> ALL records become revisits
    crawl2 = crawl1.withColumn(
        "warc_ts", F2.col("warc_ts") + F2.expr("INTERVAL 1 DAY")
    )
    digests = spark.createDataFrame(
        [(F"sha1:{__import__('hashlib').sha1(b).hexdigest()}",) for b, _ in before.values()],
        "payload_digest string",
    )
    write_warc(crawl2, wdir + "2", n_shards=1, revisit_digests=digests)
    import shutil as _sh

    for f in os.listdir(wdir + "2"):
        if f.endswith(".warc.gz"):
            _sh.copy(os.path.join(wdir + "2", f), os.path.join(wdir, "c2-" + f))
    stream_warc_ingest(t, cfg, wdir, ckpt)

    after = {r["url"]: (bytes(r["html"]), r["warc_ts"]) for r in t.read().collect()}
    assert set(after) == set(before)
    for u in after:
        assert after[u][0] == before[u][0], "stored body must survive revisit"
        assert after[u][1] > before[u][1], "revisit's newer fetch time wins"
