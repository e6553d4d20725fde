"""WARC container source — Common Crawl's actual on-disk format (ISO 28500).

The north-star stream is "Common-Crawl-style web pages"; Common Crawl
publishes those pages as WARC files: concatenated records, each a
`WARC/1.0` header block (named-field lines, CRLF-terminated, blank-line
separated from the body) followed by `Content-Length` bytes of payload —
for `WARC-Type: response` records the payload is an HTTP response whose
entity body is the page HTML. Shipped files are *member-per-record gzip*:
every record is its own gzip member so a reader can start decompressing
at any member boundary (this is why Common Crawl offsets in CDX indexes
are usable). Reference parity: the reference ingests the same logical
records through connector JSON; this source ingests the container format
those records actually live in, mapping them onto the engine's
(url, warc_ts, html) input_hint columns.

Spark-first layout:

  * WRITE — one shard per task via `applyInPandas` over a deterministic
    `hash(url) % n_shards` grouping: each task serializes its whole shard
    (records sorted by url for replay-stable bytes) and writes ONE
    `shard-XXXX.warc.gz`. No driver funnel; shard count = write
    parallelism, exactly how a 1000-executor job would lay down a crawl
    segment.
  * READ — `spark.read.format("binaryFile")` distributes whole files to
    tasks (Common Crawl shards files at ~1 GiB precisely so that file ==
    parallel unit), then `mapInPandas` decompresses gzip members and
    parses records into Arrow batches executor-side. The driver never
    sees a record. At 100 TB the next refinement is CDX-offset splits
    (one task per member *range* within a file); the member-per-record
    gzip written here is what makes that possible.

Parsing is pure-Python per record header (a dozen header lines), but the
payload bytes move as Arrow buffers — there is no per-row Python over
record *contents*, matching the input_hint's "no per-row Python" rule for
the columnar path.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from airbyte_spark.sources.registry import register_source

_CRLF = b"\r\n"

# Parsed-record schema: the input_hint page shape + container provenance.
# payload_digest/is_revisit carry the archive-dedup semantics (see
# write_warc's revisit_digests and resolve_revisits).
WARC_PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampNTZType(), True),
        StructField("html", BinaryType(), True),
        StructField("record_id", StringType(), True),
        StructField("content_length", LongType(), True),
        StructField("warc_file", StringType(), True),
        StructField("payload_digest", StringType(), True),
        StructField("is_revisit", BooleanType(), False),
    ]
)


# --------------------------------------------------------------------------
# Record serializer / parser (spec core, shared by writer and reader)
# --------------------------------------------------------------------------


def payload_digest(html: bytes) -> str:
    """Labelled payload digest per ISO 28500 §5.9 (hex instead of the
    Common-Crawl base32 — the label makes either self-describing)."""
    import hashlib

    return "sha1:" + hashlib.sha1(html).hexdigest()


def _warc_record_bytes(
    url: str, ts_iso: str, html: bytes, record_id: str, revisit: bool = False
) -> bytes:
    """One spec-correct record, uncompressed.

    Header fields per ISO 28500 §5 (mandatory: WARC-Record-ID, Content-Length,
    WARC-Date, WARC-Type); the HTTP envelope mirrors what crawlers store
    (status line + Content-Length), so `identified-payload-type` consumers
    and this module's own parser agree on where the HTML starts.

    revisit=True writes a `WARC-Type: revisit` record (§6.7.2,
    identical-payload-digest profile): the fetch is recorded — url, time,
    digest — but the unchanged body is NOT stored again. `html` must then
    be the body whose digest is recorded (used for the digest header only).
    """
    digest = payload_digest(html)
    if revisit:
        http = b""
        wtype = b"revisit"
        profile = (
            b"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
            b"identical-payload-digest" + _CRLF
        )
    else:
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html; charset=utf-8" + _CRLF
            + b"Content-Length: " + str(len(html)).encode() + _CRLF
            + _CRLF
            + html
        )
        wtype = b"response"
        profile = b""
    hdr = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: " + wtype + _CRLF
        + b"WARC-Record-ID: <urn:uuid:" + record_id.encode() + b">" + _CRLF
        + b"WARC-Date: " + ts_iso.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Payload-Digest: " + digest.encode() + _CRLF
        + profile
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    # record terminator: two CRLFs after the payload (§4)
    return hdr + http + _CRLF + _CRLF


def _parse_one_record(data: bytes, pos: int, filename: str) -> tuple[dict | None, int]:
    """Parse the record starting at `pos`; return (record-or-None, next pos).
    None = a valid non-response record (warcinfo/request/metadata)."""
    hdr_end = data.find(_CRLF + _CRLF, pos)
    if hdr_end < 0:
        raise ValueError(f"{filename}: truncated header at byte {pos}")
    header_lines = data[pos:hdr_end].split(_CRLF)
    if not header_lines[0].startswith(b"WARC/"):
        raise ValueError(
            f"{filename}: expected WARC version line at byte {pos}, "
            f"got {header_lines[0][:40]!r}"
        )
    fields: dict[str, str] = {}
    for line in header_lines[1:]:
        k, _, v = line.partition(b":")
        fields[k.strip().decode().lower()] = v.strip().decode()
    try:
        clen = int(fields["content-length"])
    except KeyError:
        # corrupted/absent Content-Length header: a parse error like any
        # other — must cost one record under on_error="skip", not the job
        raise ValueError(f"missing Content-Length in member at {pos}")
    body = data[hdr_end + 4 : hdr_end + 4 + clen]
    if len(body) < clen:
        raise ValueError(f"{filename}: truncated body at byte {pos}")
    nxt = hdr_end + 4 + clen
    wtype = fields.get("warc-type")
    if wtype not in ("response", "revisit"):
        return None, nxt
    if wtype == "revisit":
        html = None
    else:
        # strip the stored HTTP envelope down to the entity body
        http_end = body.find(_CRLF + _CRLF)
        html = body[http_end + 4 :] if http_end >= 0 else body
    rid = fields.get("warc-record-id", "")
    if rid.startswith("<urn:uuid:") and rid.endswith(">"):
        rid = rid[len("<urn:uuid:") : -1]
    return (
        {
            "url": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "html": html,
            "record_id": rid,
            "content_length": clen,
            "warc_file": filename,
            "payload_digest": fields.get("warc-payload-digest"),
            "is_revisit": wtype == "revisit",
        },
        nxt,
    )


def _parse_plain(data: bytes, filename: str) -> Iterator[dict]:
    pos, n = 0, len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        rec, pos = _parse_one_record(data, pos, filename)
        if rec is not None:
            yield rec


def parse_warc_members(
    blob: bytes, filename: str = "", on_error: str = "fail"
) -> Iterator[dict]:
    """Yield parsed response records from a (possibly multi-member) gzip
    or plain WARC byte blob. Tolerates non-response record types
    (warcinfo, request, metadata) by skipping them — real Common Crawl
    files interleave all three.

    on_error: "fail" raises on the first malformed member/record;
    "skip" quarantines it (yields a {"_error": ..., "_offset": ...} marker
    instead) and resumes at the next gzip member boundary — a corrupt
    member must cost one record, not a 1 GiB shard, let alone the job.
    """
    if blob[:2] == b"\x1f\x8b":
        import zlib

        pos, n = 0, len(blob)
        while pos < n:
            d = zlib.decompressobj(wbits=31)
            try:
                member = d.decompress(blob[pos:]) + d.flush()
                consumed = (n - pos) - len(d.unused_data)
                if consumed <= 0:
                    raise ValueError("member consumed no input")
            except (zlib.error, ValueError) as exc:
                if on_error != "skip":
                    raise ValueError(
                        f"{filename}: corrupt gzip member at byte {pos}: {exc}"
                    ) from exc
                yield {
                    "_error": f"corrupt gzip member: {exc}",
                    "_offset": pos,
                    "warc_file": filename,
                }
                # resync: next gzip magic after the broken member's start
                nxt = blob.find(b"\x1f\x8b\x08", pos + 1)
                if nxt < 0:
                    return
                pos = nxt
                continue
            try:
                yield from _parse_plain(member, filename)
            except ValueError as exc:
                if on_error != "skip":
                    raise
                yield {"_error": str(exc), "_offset": pos, "warc_file": filename}
            pos += consumed
    else:
        try:
            yield from _parse_plain(blob, filename)
        except ValueError as exc:
            if on_error != "skip":
                raise
            yield {"_error": str(exc), "_offset": -1, "warc_file": filename}


# --------------------------------------------------------------------------
# Distributed writer
# --------------------------------------------------------------------------


def write_warc(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    index: bool = False,
    revisit_digests: DataFrame | None = None,
) -> None:
    """Write (url, ts, html) rows as member-per-record gzip WARC shards.

    One output file per shard, shard = xxhash64(url) % n_shards, records
    url-sorted within a shard — byte-deterministic across runs and across
    cluster sizes (the same property the lake format's content manifest
    relies on). Each task writes its own file: write parallelism ==
    n_shards, no driver collect.

    index=True additionally emits a CDX-style sidecar per shard
    (`shard-XXXX.cdx.parquet`: url, offset, length, warc_file) — Common
    Crawl's random-access map, in a columnar form Spark can push url
    predicates into. See read_warc_indexed.

    revisit_digests: one-column DataFrame of payload digests already held
    by earlier crawls (build with `payload_digest_expr`). Pages whose body
    digest is in the set are written as `WARC-Type: revisit` records —
    the archive-world dedup: the fetch event keeps its url/time/digest,
    the unchanged bytes are stored ONCE across crawls. The digest set
    joins as a normal equi-join (broadcast when small, shuffle when not);
    resolve_revisits() reconstitutes bodies at read time.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    src = df.select(
        F.col(url_col).cast("string").alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts_iso"),
        F.col(html_col).cast("binary").alias("html"),
        F.md5(F.col(url_col).cast("string")).alias("record_id"),
        F.pmod(F.xxhash64(F.col(url_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("_shard"),
    )
    if revisit_digests is not None:
        dcol = revisit_digests.columns[0]
        known = revisit_digests.select(
            F.col(dcol).alias("_known_digest")
        ).distinct()
        src = (
            src.withColumn("_digest", payload_digest_expr(F.col("html")))
            .join(known, F.col("_digest") == F.col("_known_digest"), "left")
            .withColumn("_revisit", F.col("_known_digest").isNotNull())
            .drop("_digest", "_known_digest")
        )
    else:
        src = src.withColumn("_revisit", F.lit(False))

    def write_shard(pdf):
        import pandas as pd

        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("url", kind="mergesort")
        fname = f"shard-{shard:04d}.warc.gz"
        path = os.path.join(out_dir, fname)
        tmp = path + ".inprogress"
        idx_rows = []
        pos = 0
        with open(tmp, "wb") as fh:
            for url, ts_iso, html, rid, rev in zip(
                pdf["url"], pdf["ts_iso"], pdf["html"], pdf["record_id"],
                pdf["_revisit"],
            ):
                rec = _warc_record_bytes(
                    url, ts_iso or "1970-01-01T00:00:00Z",
                    bytes(html) if html is not None else b"", rid,
                    revisit=bool(rev),
                )
                # one gzip member per record (mtime=0: reproducible bytes)
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                member = buf.getvalue()
                fh.write(member)
                idx_rows.append((url, pos, len(member)))
                pos += len(member)
        os.replace(tmp, path)  # atomic publish per shard
        if index:
            import pyarrow as pa
            import pyarrow.parquet as papq

            tbl = pa.table(
                {
                    "url": [r[0] for r in idx_rows],
                    "offset": pa.array([r[1] for r in idx_rows], pa.int64()),
                    "length": pa.array([r[2] for r in idx_rows], pa.int64()),
                    "warc_file": [fname] * len(idx_rows),
                }
            )
            ipath = os.path.join(out_dir, f"shard-{shard:04d}.cdx.parquet")
            papq.write_table(tbl, ipath + ".inprogress")
            os.replace(ipath + ".inprogress", ipath)
        return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

    out_schema = StructType(
        [StructField("shard", LongType()), StructField("n", LongType())]
    )
    # applyInPandas groups a whole shard into one task; the tiny (shard, n)
    # result is the only thing that crosses back to the driver.
    src.groupBy("_shard").applyInPandas(write_shard, schema=out_schema).collect()


# --------------------------------------------------------------------------
# Distributed reader
# --------------------------------------------------------------------------


def parse_warc_files_df(files: DataFrame, on_error: str = "fail") -> DataFrame:
    """binaryFile rows (path, content) → parsed page rows (shared by the
    batch reader and the streaming ingest's foreachBatch). on_error="skip"
    drops quarantined markers from the page output (surface them with
    warc_quarantine)."""

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                rows = [
                    r
                    for r in parse_warc_members(
                        bytes(blob), str(fpath), on_error=on_error
                    )
                    if "_error" not in r
                ]
                if not rows:
                    continue
                out = pd.DataFrame.from_records(rows)
                # ISO8601 accepts both second-precision and WARC 1.1
                # fractional-second dates; a silently-NaT'd timestamp
                # would degrade the LWW cursor to a url-only hash tie
                ts = pd.to_datetime(
                    out.pop("warc_date"), format="ISO8601",
                    errors="coerce", utc=True,
                )
                out["warc_ts"] = ts.dt.tz_localize(None)
                yield out[[f.name for f in WARC_PAGE_SCHEMA.fields]]

    return files.select("path", "content").mapInPandas(
        parse, schema=WARC_PAGE_SCHEMA
    )


def payload_digest_expr(html_col) -> F.Column:
    """Column form of payload_digest (JVM sha1, no Python)."""
    return F.concat(F.lit("sha1:"), F.sha1(html_col))


def resolve_revisits(pages: DataFrame, bodies: DataFrame) -> DataFrame:
    """Reconstitute revisit records' bodies from a digest→html store.

    `bodies` is any DataFrame carrying (payload_digest, html) — typically
    the previous crawl's parsed pages. One equi-join on the digest; rows
    that already carry a body pass through untouched. Revisits whose
    digest is absent from the store keep html NULL (surface them — that's
    a broken archive)."""
    b = (
        bodies.select(
            F.col("payload_digest").alias("_pd"), F.col("html").alias("_body")
        )
        .filter(F.col("_pd").isNotNull() & F.col("_body").isNotNull())
        .dropDuplicates(["_pd"])
    )
    return (
        pages.join(b, pages["payload_digest"] == b["_pd"], "left")
        .withColumn("html", F.coalesce(pages["html"], F.col("_body")))
        .drop("_pd", "_body")
    )


def read_warc(
    spark: SparkSession, path_glob: str, on_error: str = "fail"
) -> DataFrame:
    """Parse WARC(.gz) files into the page schema, one task per file.

    binaryFile ships each file's bytes to an executor; parsing emits Arrow
    batches there. `warc_ts` is typed timestamp_ntz from WARC-Date.
    on_error="skip": malformed members are quarantined instead of failing
    the job — pair with warc_quarantine for the audit trail.
    """
    return parse_warc_files_df(
        spark.read.format("binaryFile").load(path_glob), on_error=on_error
    )


def warc_quarantine(spark: SparkSession, path_glob: str) -> DataFrame:
    """Audit scan: one row per malformed member/record across the segment
    (warc_file, offset, error). Empty = the segment is clean. Distributed
    the same way as read_warc (one task per file)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def scan(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                errs = [
                    r
                    for r in parse_warc_members(
                        bytes(blob), str(fpath), on_error="skip"
                    )
                    if "_error" in r
                ]
                if errs:
                    yield pd.DataFrame(
                        {
                            "warc_file": [e["warc_file"] for e in errs],
                            "offset": [e["_offset"] for e in errs],
                            "error": [e["_error"] for e in errs],
                        }
                    )

    return files.select("path", "content").mapInPandas(
        scan, schema="warc_file string, offset long, error string"
    )


def read_warc_indexed(
    spark: SparkSession,
    segment_dir: str,
    urls: DataFrame | None = None,
    tasks: int | None = None,
) -> DataFrame:
    """Random-access / range-split WARC read through the CDX sidecar.

    Instead of shipping whole files to tasks (read_warc), the CDX index
    supplies (warc_file, offset, length) per record, so:

      * POINT LOOKUPS — pass `urls` (a one-column DataFrame): the index is
        join-pruned to just those records and each task seek-reads only
        its members' byte ranges. Fetching 1k pages out of a 100 TB crawl
        touches kilobytes per page, not files.
      * RANGE SPLITS — without `urls`, the index rows are repartitioned to
        `tasks` (default: shuffle partitions), decoupling read parallelism
        from file count: one 1 GiB shard can feed 32 tasks because every
        member is an independently-decompressible gzip member.

    Local seek-read here ≡ an S3/HTTP ranged GET in deployment — Common
    Crawl serves exactly these (offset, length) ranges over HTTP.
    """
    idx = spark.read.parquet(f"{segment_dir}/*.cdx.parquet")
    if urls is not None:
        # caller-supplied lookup set: un-hinted so AQE broadcasts it only
        # while it measures small (a "point lookup" of a billion urls
        # must degrade to a shuffle join, not a driver OOM)
        ucol = urls.columns[0]
        idx = idx.join(
            urls.select(F.col(ucol).alias("url")).distinct(),
            on="url",
            how="left_semi",
        )
    n = tasks or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    idx = idx.repartition(n)

    def fetch(batches: Iterator) -> Iterator:
        import os

        import pandas as pd

        handles: dict[str, object] = {}
        try:
            for pdf in batches:
                rows = []
                for fname, off, ln in zip(
                    pdf["warc_file"], pdf["offset"], pdf["length"]
                ):
                    fh = handles.get(fname)
                    if fh is None:
                        fh = handles[fname] = open(
                            os.path.join(segment_dir, fname), "rb"
                        )
                    fh.seek(int(off))
                    member = fh.read(int(ln))
                    rows.extend(parse_warc_members(member, str(fname)))
                if not rows:
                    continue
                out = pd.DataFrame.from_records(rows)
                # ISO8601 accepts both second-precision and WARC 1.1
                # fractional-second dates; a silently-NaT'd timestamp
                # would degrade the LWW cursor to a url-only hash tie
                ts = pd.to_datetime(
                    out.pop("warc_date"), format="ISO8601",
                    errors="coerce", utc=True,
                )
                out["warc_ts"] = ts.dt.tz_localize(None)
                yield out[[f.name for f in WARC_PAGE_SCHEMA.fields]]
        finally:
            for fh in handles.values():
                fh.close()

    return idx.select("warc_file", "offset", "length").mapInPandas(
        fetch, schema=WARC_PAGE_SCHEMA
    )


def stream_warc_ingest(
    table,
    cfg,
    warc_dir: str,
    spark_checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Tail a crawl-segment directory as a Structured Streaming source and
    merge each WARC file into the lake with one idempotent commit per file.

    This is the deployment loop for a live crawl: the crawler drops
    `*.warc.gz` shards into `warc_dir`; the engine's binaryFile stream
    picks up new files, parses them executor-side, derives the CDC
    envelope (hash lsn, LWW on WARC-Date) and applies merge_upsert with
    checkpoint key `warc-<filename>`. Exactly-once holds even if the
    Spark checkpoint dir is lost, because the committed-file set lives in
    the table manifest, transactional with the data — the same guarantee
    the parquet-changelog path (pipeline.run_stream) provides.

    `table`/`cfg`: LakeTable + StreamConfig whose schema is the page shape
    (url, warc_ts, html, _ab_cdc_lsn, _ab_cdc_deleted_at). Returns the
    query handle (terminated when available_now).
    """
    import os

    from airbyte_spark.lake.merge import merge_upsert

    from pyspark.sql.types import TimestampType

    spark = table.spark
    binfile_schema = StructType(
        [
            StructField("path", StringType(), False),
            StructField("modificationTime", TimestampType(), False),
            StructField("length", LongType(), False),
            StructField("content", BinaryType(), True),
        ]
    )
    stream = (
        spark.readStream.format("binaryFile")
        .schema(binfile_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.warc.gz")
        .load(warc_dir)
    )

    def handle(files: DataFrame, epoch_id: int) -> None:
        names = sorted(
            os.path.basename(r[0]) for r in files.select("path").distinct().collect()
        )
        pending = [n for n in names if f"warc-{n}" not in table.committed()]
        if not pending:
            return
        keep = files.filter(
            F.element_at(F.split(F.col("path"), "/"), -1).isin(pending)
        )
        pages = parse_warc_files_df(keep)
        # Revisit records (cross-crawl storage dedup) carry NO body; merged
        # raw, their newer warc_ts would WIN the LWW merge and null out the
        # stored page html. Resolve bodies from (a) response records in the
        # same batch sharing the digest, then (b) the table's stored pages
        # for the revisited urls; revisits still unresolved are dropped —
        # content is unchanged upstream, so skipping preserves the stored
        # body and the byte-identical-text invariant. (At fleet scale,
        # point (b) becomes a CDX/digest store lookup — read_warc_indexed.)
        rev = F.col("is_revisit") & F.col("html").isNull()
        rev_urls = pages.filter(rev).select("url").distinct()
        stored = (
            # batch-bounded (revisit urls of ONE micro-batch) but still
            # data-dependent — un-hinted, AQE decides from measured size
            table.read()
            .join(rev_urls, "url", "left_semi")
            .select(payload_digest_expr(F.col("html")).alias("payload_digest"), "html")
        )
        bodies = pages.select("payload_digest", "html").unionByName(stored)
        pages = resolve_revisits(pages, bodies).filter(
            ~(F.col("is_revisit") & F.col("html").isNull())
        )
        h = F.xxhash64("url", F.col("warc_ts").cast("string"))
        batch = (
            pages.withColumn("_ab_cdc_lsn", F.abs(h).cast("long"))
            .withColumn(
                "_ab_cdc_deleted_at", F.lit(None).cast("timestamp_ntz")
            )
            .select(*cfg.schema.fieldNames())
        )
        merge_upsert(
            table, batch, cfg, checkpoint_key=[f"warc-{n}" for n in pending]
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", spark_checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


@register_source("warc")
def warc_source(path_glob: str, n_checkpoints: int = 16):
    """Registry plug-in: a WARC crawl segment as a CDC change stream.

    The crawl is an insert-only changelog (every record is an upsert of
    its url at its fetch time). lsn must only be a *deterministic, unique*
    tiebreaker — LWW ordering rides warc_ts — so it derives from
    xxhash64(url, warc_ts) rather than a global row_number (which would be
    a one-task global sort at crawl scale). checkpoint_id buckets records
    by url hash into `n_checkpoints` replayable segments; segment order is
    arbitrary, which is safe because an insert-only LWW stream is
    order-confluent (the property the engine's permutation tests pin).
    """

    def read(spark: SparkSession, state: dict) -> DataFrame:
        from airbyte_spark.sources.registry import _apply_state, _complete_envelope

        pages = read_warc(spark, path_glob)
        # resolve revisit bodies within the crawl segment (same-digest
        # response records); revisits that stay body-less are dropped —
        # merging them would null the stored page html via LWW. For
        # cross-crawl resolution pass a digest→body store explicitly
        # (resolve_revisits; see src_warc_revisit_dedup).
        pages = resolve_revisits(
            pages, pages.select("payload_digest", "html")
        ).filter(~(F.col("is_revisit") & F.col("html").isNull()))
        h = F.xxhash64("url", F.col("warc_ts").cast("string"))
        df = pages.withColumn(
            "_ab_cdc_lsn", F.abs(h).cast("long")
        ).withColumn(
            "checkpoint_id", F.pmod(F.xxhash64("url"), F.lit(n_checkpoints)).cast("long")
        )
        return _apply_state(
            _complete_envelope(df, "warc_ts", n_checkpoints, "warc"), state
        )

    return read
