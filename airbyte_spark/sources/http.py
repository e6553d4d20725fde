"""HTTP API stream source — paginated REST endpoints as DataFrames.

The reference's dominant source shape is the airbyte-cdk HTTP stream
(airbyte-cdk/python/airbyte_cdk/sources/streams/http/http.py:25-361): a
Stream subclass supplies `path` / `request_params` / `next_page_token` /
`parse_response`, and the framework walks pages sequentially with retry
and backoff. Parent-child substreams
(http.py:363-386, HttpSubStream.stream_slices) iterate one child read per
parent record.

Spark-first restatement — the page, not the record, is the unit of
parallelism:

  * OFFSET pagination (the common REST shape: `?offset=&limit=`, total
    known or probe-able) distributes page fetches across the cluster:
    `spark.range(n_pages)` → `mapInPandas` where each task requests its
    own page window and yields Arrow batches. 10^6 pages become a
    1000-executor embarrassingly-parallel scan instead of one consumer's
    loop. Records never pass through the driver.
  * TOKEN pagination (opaque `next_page_token` chaining) is inherently
    sequential — each token is only learned from the previous response
    (the reference has the same constraint). The driver walks the chain
    but only as a *page enumerator*; parsing/typing happens distributed
    once the raw pages are parallelized.
  * SUBSTREAMS parallelize over parents: the parent DataFrame's keys are
    partitioned and each task pages through its parents' child endpoints
    — N_parents × N_pages fetches spread over the cluster, versus the
    reference's nested sequential loop.

Transport is injected (`Transport = (path, params) -> response dict`), so
the engine stays testable in this offline sandbox: tests bind a
deterministic in-process REST fake over the driver's events parquet
(`events_rest_transport`), and the same seam is where a real `requests`
session (with auth headers) plugs in in deployment. Executors import only
pyarrow for the fake — never Spark.

Response contract (the `parse_response`/`next_page_token` collapse):
  {"records": [dict, ...], "next_page_token": str|None, "total": int|None}
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType

from airbyte_spark.sources.registry import register_source

Transport = Callable[[str, dict], dict]


class TransportError(Exception):
    """Retryable transport failure (≡ the cdk's DefaultBackoffException).
    Non-TransportError exceptions (plain 4xx, parse errors) propagate
    immediately — the reference's give-up-on-unexpected-4xx rule
    (rate_limiting.py:29-33)."""


class RateLimitError(TransportError):
    """429-style throttle carrying the server-advised wait (≡ the cdk's
    UserDefinedBackoffException built from Retry-After,
    rate_limiting.py:47-68): the retry wrapper sleeps exactly
    `retry_after` instead of the exponential schedule."""

    def __init__(self, message: str = "429 rate limited", retry_after: float = 1.0):
        super().__init__(message)
        self.retry_after = retry_after


def with_retries(
    transport: Transport,
    max_tries: int = 5,
    backoff_base: float = 0.5,
    sleep: Callable[[float], None] | None = None,
) -> Transport:
    """Retry wrapper (http.py:286-311 backoff policy): exponential backoff
    for generic transport failures, server-advised sleep for rate limits.

    `sleep` is injectable so tests assert the schedule without waiting.
    """
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep

    def call(path: str, params: dict) -> dict:
        last: Exception | None = None
        for attempt in range(max_tries):
            try:
                return transport(path, params)
            except RateLimitError as exc:  # server says exactly how long
                last = exc
                if attempt < max_tries - 1:
                    do_sleep(exc.retry_after)
            except TransportError as exc:  # only transport-level failures retry
                last = exc
                if attempt < max_tries - 1:
                    do_sleep(backoff_base * (2**attempt))
        raise last  # type: ignore[misc]

    return call


@dataclass
class HttpStreamConfig:
    """Declarative stream description (≡ one Stream subclass)."""

    name: str
    path: str
    schema: StructType
    page_size: int = 1_000
    pagination: str = "offset"  # "offset" | "token"
    params: dict = field(default_factory=dict)
    # offset mode: how to learn the total if the probe response omits it
    total_records: int | None = None
    # max parallel page-fetch tasks (polite-crawl cap; a real API's rate
    # limit bounds useful parallelism long before the cluster does)
    max_fetch_tasks: int = 32


def _records_to_pandas(records: list[dict], schema: StructType):
    import pandas as pd

    cols = [f.name for f in schema.fields]
    if not records:
        return pd.DataFrame({c: [] for c in cols})
    df = pd.DataFrame.from_records(records)
    for c in cols:
        if c not in df.columns:
            df[c] = None
    return df[cols]


def read_http_stream(
    spark: SparkSession,
    config: HttpStreamConfig,
    transport: Transport,
    state: dict | None = None,
) -> DataFrame:
    """Materialize one HTTP stream as a DataFrame.

    `state` entries become extra request params (the incremental hook: a
    saved cursor like {"updated_since": ...} reaches the API unchanged —
    ≡ request_params(stream_state) in the cdk).
    """
    params = {**config.params, **(state or {})}
    if config.pagination == "offset":
        return _read_offset_paginated(spark, config, transport, params)
    if config.pagination == "token":
        return _read_token_paginated(spark, config, transport, params)
    raise ValueError(f"unknown pagination mode '{config.pagination}'")


def _read_offset_paginated(
    spark: SparkSession,
    config: HttpStreamConfig,
    transport: Transport,
    params: dict,
) -> DataFrame:
    total = config.total_records
    if total is None:
        probe = transport(config.path, {**params, "offset": 0, "limit": 1})
        total = probe.get("total")
        if total is None:
            raise ValueError(
                f"stream '{config.name}': offset pagination needs a total "
                "(probe response had none; set total_records or use token mode)"
            )
    n_pages = max(1, math.ceil(total / config.page_size))
    pages = spark.range(n_pages).repartition(
        min(n_pages, config.max_fetch_tasks)
    )
    path, page_size, schema = config.path, config.page_size, config.schema
    frozen = sorted(params.items())

    def fetch(batches: Iterator) -> Iterator:
        p = dict(frozen)
        for pdf in batches:
            for page_id in pdf["id"]:
                resp = transport(
                    path,
                    {**p, "offset": int(page_id) * page_size, "limit": page_size},
                )
                out = _records_to_pandas(resp.get("records", []), schema)
                if len(out):
                    yield out

    return pages.mapInPandas(fetch, schema=config.schema)


def _read_token_paginated(
    spark: SparkSession,
    config: HttpStreamConfig,
    transport: Transport,
    params: dict,
) -> DataFrame:
    """Sequential token walk (driver) → distributed parse/typing.

    The raw pages are parallelized before any per-record work: the driver
    holds only the JSON-ish dicts the API returned, and schema alignment /
    casting runs as an executor-side Arrow job.
    """
    raw_pages: list[list[dict]] = []
    token: str | None = None
    while True:
        p = dict(params)
        p["limit"] = config.page_size
        if token is not None:
            p["page_token"] = token
        resp = transport(config.path, p)
        recs = resp.get("records", [])
        if recs:
            raw_pages.append(recs)
        token = resp.get("next_page_token")
        if token is None:
            break
    schema = config.schema
    if not raw_pages:
        return spark.createDataFrame([], schema)
    pages_rdd = spark.sparkContext.parallelize(
        raw_pages, numSlices=min(len(raw_pages), config.max_fetch_tasks)
    )
    flat = pages_rdd.flatMap(
        lambda page: [tuple(r.get(f.name) for f in schema.fields) for r in page]
    )
    return spark.createDataFrame(flat, schema)


def read_http_substream(
    spark: SparkSession,
    parents: DataFrame,
    parent_key: str,
    config: HttpStreamConfig,
    transport: Transport,
    child_parent_col: str | None = None,
) -> DataFrame:
    """Parent-child substream (HttpSubStream, http.py:363-386).

    `config.path` is a template with `{parent}` (e.g. "users/{parent}/
    events"). Each task pages through the child endpoint for its slice of
    parent keys — parents fan out across the cluster, pagination within a
    parent stays sequential (token chains are per-parent).

    child_parent_col: if set, stamp the parent key on every child row
    (the foreign key the reference's substream records carry implicitly).
    """
    keys = parents.select(F.col(parent_key).alias("_parent")).distinct()
    keys = keys.repartition(config.max_fetch_tasks)
    path_tpl, page_size, schema = config.path, config.page_size, config.schema
    frozen = sorted(config.params.items())
    out_schema = schema
    if child_parent_col is not None:
        pfield = parents.schema[parent_key]
        out_schema = StructType(
            schema.fields + [StructField(child_parent_col, pfield.dataType, True)]
        )

    def fetch(batches: Iterator) -> Iterator:
        base = dict(frozen)
        for pdf in batches:
            for parent in pdf["_parent"]:
                offset, token = 0, None
                while True:
                    p = dict(base)
                    p["limit"] = page_size
                    if token is not None:
                        p["page_token"] = token
                    else:
                        p["offset"] = offset
                    resp = transport(path_tpl.format(parent=parent), p)
                    recs = resp.get("records", [])
                    out = _records_to_pandas(recs, schema)
                    if child_parent_col is not None:
                        out[child_parent_col] = parent
                    if len(out):
                        yield out
                    token = resp.get("next_page_token")
                    if token is not None:
                        continue
                    if len(recs) < page_size:
                        break
                    offset += page_size

    return keys.mapInPandas(fetch, schema=out_schema)


# --------------------------------------------------------------------------
# Deterministic in-process REST fake over the driver's events parquet —
# the sandbox stand-in for a real HTTP API (and the unit-test transport).
# Endpoints:
#   "events"                offset/limit (+ optional min_ts param) over
#                           events ordered by event_id; responses carry
#                           "total" so offset mode self-probes
#   "events_chain"          token pagination over the same data (token =
#                           next start event_id, opaque to the client)
#   "users/{uid}/events"    child endpoint for substream tests
# --------------------------------------------------------------------------

_FAKE_CACHE: dict[str, Any] = {}


def _events_table(sf_dir: str):
    """Cached event_id-sorted pyarrow Table. Kept columnar: a page request
    converts only its own slice to python dicts, so a worker serving a few
    1k-row pages never pays a full-table to_pylist (which made the fake —
    not the engine — the benchmark bottleneck)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    key = f"events:{sf_dir}"
    if key not in _FAKE_CACHE:
        t = pq.read_table(f"{sf_dir}/events.parquet")
        _FAKE_CACHE[key] = t.take(pc.sort_indices(t.column("event_id")))
    return _FAKE_CACHE[key]


def events_rest_transport(sf_dir: str) -> Transport:
    def call(path: str, params: dict) -> dict:
        import pyarrow.compute as pc

        t = _events_table(sf_dir)
        if path.startswith("users/"):
            uid = int(path.split("/")[1])
            t = t.filter(pc.equal(t.column("user_id"), uid))
        elif path not in ("events", "events_chain"):
            raise TransportError(f"404 {path}")
        if "min_ts" in params:
            t = t.filter(pc.greater_equal(t.column("ts"), params["min_ts"]))
        limit = int(params.get("limit", 1000))
        if path == "events_chain" or "page_token" in params:
            start = int(params.get("page_token", 0))
            rest = t.filter(pc.greater_equal(t.column("event_id"), start))
            page = rest.slice(0, limit).to_pylist()
            nxt = page[-1]["event_id"] + 1 if len(page) == limit else None
            if nxt is not None and len(rest) <= limit:
                nxt = None
            return {"records": page, "next_page_token": nxt, "total": len(t)}
        offset = int(params.get("offset", 0))
        return {
            "records": t.slice(offset, limit).to_pylist(),
            "next_page_token": None,
            "total": len(t),
        }

    return call


@register_source("http_events")
def http_events_source(
    sf_dir: str,
    schema: StructType,
    pagination: str = "offset",
    page_size: int = 1_000,
):
    """Registry plug-in: the fake-REST events API as a (spark, state) source."""

    def read(spark: SparkSession, state: dict) -> DataFrame:
        cfg = HttpStreamConfig(
            name="events",
            path="events" if pagination == "offset" else "events_chain",
            schema=schema,
            page_size=page_size,
            pagination=pagination,
        )
        return read_http_stream(
            spark, cfg, events_rest_transport(sf_dir), state=state
        )

    return read
