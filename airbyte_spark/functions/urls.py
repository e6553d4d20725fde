"""URL canonicalization + domain analytics for a web-page change stream.

Common-Crawl-style pipelines key everything on the url (it IS the CDC
primary key here — BASELINE.json input_hint), so url hygiene is part of
the ingest contract:

  canonicalize_url  lowercase scheme+host, strip default ports, drop
                    fragments and tracking query params (utm_*, fbclid,
                    gclid, ref), remove trailing slash on non-root paths —
                    so the same logical page arriving under cosmetic
                    variants maps to ONE merge key instead of fanning out
                    into duplicate rows.
  url_domain        registrable host extraction (the hot-key/skew unit:
                    per-domain salting and per-domain rate stats key on it).
  domain_stats      per-domain event/page/delete counts + cursor high-water
                    mark — the skew-detection input for salting decisions.

All pure column expressions (regexp over the url string) — fused into the
scan stage, zero shuffles except the final per-domain aggregate, which is
a map-side-combined groupBy on ~registrable-domain cardinality (millions,
not billions — safe at 100 TB).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# query params that never identify content (tracking/attribution)
TRACKING_PARAMS = ["utm_[a-z]+", "fbclid", "gclid", "msclkid", "ref"]

_TRACK_RE = "(" + "|".join(TRACKING_PARAMS) + ")=[^&#]*"


def url_domain(url: Column) -> Column:
    """Host part of the url, lowercased, default port stripped."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    return F.regexp_replace(host, r":(80|443)$", "")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a page url (see module docstring for the rules).

    Deterministic, idempotent (canonicalize(canonicalize(u)) == canonicalize(u)),
    and expressible as a regexp chain so it runs JVM-side in the scan stage.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([/?#].*)?$", 1)
    # drop fragment
    rest = F.regexp_replace(rest, r"#.*$", "")
    # drop tracking params (then tidy the separators they leave behind:
    # 'a=1&&b=2' → 'a=1&b=2', '?&a=1' → '?a=1', trailing '?'/'&' → '')
    rest = F.regexp_replace(rest, _TRACK_RE, "")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    # trailing slash on a non-root path
    rest = F.regexp_replace(rest, r"^(/.+?)/+($|\?)", r"$1$2")
    return F.concat(scheme, F.lit("://"), url_domain(url), rest)


def domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-domain stream stats: events, distinct pages, deletes, max cursor.

    This is the input to hot-domain skew handling (BASELINE.json north_star:
    "url-hash salting plus AQE handles hot-domain skew"): domains whose
    event share exceeds a salting threshold get per-key salts in the dedup
    window. distinct-page count uses an exact two-level aggregate (first by
    (domain, url) — the url is already the shuffle key upstream — then by
    domain), not approx_count_distinct, so the oracle can match it exactly.
    """
    d = pages.withColumn("_domain", url_domain(F.col(url_col)))
    per_url = d.groupBy("_domain", url_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events_url"),
        F.sum(F.col("_ab_cdc_deleted_at").isNotNull().cast("bigint")).alias(
            "n_deletes_url"
        ),
        F.max("warc_ts").alias("max_ts_url"),
    )
    return per_url.groupBy("_domain").agg(
        F.sum("n_events_url").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_pages"),
        F.sum("n_deletes_url").alias("n_deletes"),
        F.max("max_ts_url").alias("max_warc_ts"),
    ).withColumnRenamed("_domain", "domain")


# --- URL quality filtering (C4/RefinedWeb-style curation heuristic) ----------

# words whose presence in a url marks the page as unwanted for a training
# corpus (the classic C4 "bad words in url" rule, applied to the url only —
# content-level filtering is doc_quality/doc_curate's job)
URL_BLOCKLIST = ["casino", "gamble", "xxx", "porn", "viagra"]


def url_quality(
    url: Column,
    blocklist: "list[str] | None" = None,
    max_depth: int = 6,
    max_query_len: int = 64,
    min_digit_slug: int = 12,
) -> Column:
    """Typed URL-quality verdict — the cheap pre-content curation gate a
    crawl pipeline runs BEFORE fetching or extracting anything (it needs
    only the frontier row, not the page bytes):

      blocked_word   a blocklisted token appears anywhere in the url
      too_deep       path depth > max_depth (deep archives/calendars are
                     crawler traps and rarely prose)
      long_query     query string longer than max_query_len (session ids,
                     search results, faceted navigation)
      numeric_slug   last path segment is >= min_digit_slug digits (auto-
                     generated ids: pagination mirrors, tracking pages)
      ok             none of the above

    First matching rule wins, in that priority order. Pure column
    expressions (regexp/string ops over the url) — fused into the scan,
    zero shuffles, usable as a frontier filter or a corpus filter alike.
    """
    import re as _re

    words = blocklist if blocklist is not None else URL_BLOCKLIST
    # escape metacharacters (a blocklist word is a literal token, not a
    # pattern); an EMPTY blocklist disables the rule — a naive "()" join
    # would match every url
    blocked = (
        F.lower(url).rlike("(" + "|".join(_re.escape(w) for w in words) + ")")
        if words
        else F.lit(False)
    )
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    last_seg = F.try_element_at(
        F.filter(F.split(path, "/"), lambda s: s != ""), F.lit(-1)
    )
    numeric = F.coalesce(last_seg.rlike(r"^[0-9]{%d,}$" % min_digit_slug), F.lit(False))
    return (
        F.when(blocked, F.lit("blocked_word"))
        .when(depth > max_depth, F.lit("too_deep"))
        .when(F.length(query) > max_query_len, F.lit("long_query"))
        .when(numeric, F.lit("numeric_slug"))
        .otherwise(F.lit("ok"))
    )


def url_quality_features(url: Column) -> "list[Column]":
    """The measured features behind url_quality, for audit output:
    (path depth, query length)."""
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    return [depth.cast("int").alias("depth"), F.length(query).cast("int").alias("query_len")]
