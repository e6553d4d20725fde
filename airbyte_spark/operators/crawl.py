"""Recrawl scheduling from observed change rates (crawl-frontier planning).

A CDC ingest engine over web crawls sees each url's change history as the
stream of events it merged. The classic freshness result (Cho &
Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers", TODS
2003) schedules recrawls from the per-page change rate estimated over the
observation window. This operator derives that schedule directly from the
changelog: urls that change often and haven't been fetched recently float
to the top of the frontier.

Estimator (all integer arithmetic → exact cross-engine oracle):
  n_events      events observed for the url
  span          last_lsn - first_lsn  (observation window, in stream
                positions — the stream's own clock, uniform by
                construction of a WAL)
  rate_ppm      (n_events - 1) * 1_000_000 div span   (changes per
                position, parts-per-million; 0 when only one observation —
                no interval evidence)
  staleness     horizon_lsn - last_lsn (positions since last observation)
  priority      rate_ppm * staleness  — expected missed changes, scaled;
                the greedy frontier order under a Poisson change model.

Deleted pages are dropped: a url whose LAST event (by lsn — the stream's
total order) is a tombstone is gone; recrawling it wastes fetch budget.
This is the same LWW rule the merge applies, restated as max_by.

Scale shape: one groupBy(url) aggregation — map-side combinable, hot-domain
skew collapses in the combiner; the horizon is a single-row aggregate the
planner broadcasts; final top-n is a window over the (much smaller)
per-url aggregate — at 100 TB swap for per-partition top-n + merge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def recrawl_schedule(
    changelog: DataFrame,
    top: int = 100,
    url_col: str = "url",
    lsn_col: str = "_ab_cdc_lsn",
    deleted_col: str = "_ab_cdc_deleted_at",
) -> DataFrame:
    """Rank live urls by expected missed changes (see module docstring).

    Returns (url, n_events, rate_ppm, staleness, priority, rank), rank 1 =
    recrawl first. Ties break by url ascending — fully deterministic.
    """
    lsn = F.col(lsn_col)
    per_url = changelog.groupBy(url_col).agg(
        # DISTINCT lsns, not raw rows: the changelog is at-least-once, so a
        # redelivered segment duplicates (url, lsn) rows — the estimator
        # must be redelivery-invariant or redelivered domains look "hotter"
        F.countDistinct(lsn).cast("bigint").alias("n_events"),
        F.min(lsn).cast("bigint").alias("first_lsn"),
        F.max(lsn).cast("bigint").alias("last_lsn"),
        # the url's final state under the stream's total order: tombstone?
        F.max_by(F.col(deleted_col).isNotNull(), lsn).alias("_dead"),
    )
    horizon = changelog.agg(F.max(lsn).cast("bigint").alias("horizon_lsn"))

    span = F.col("last_lsn") - F.col("first_lsn")
    rate = F.when(
        span > 0,
        F.expr("(n_events - 1) * 1000000 DIV (last_lsn - first_lsn)"),
    ).otherwise(F.lit(0))
    scored = (
        per_url.filter(~F.col("_dead"))
        .crossJoin(F.broadcast(horizon))
        .select(
            url_col,
            "n_events",
            rate.cast("bigint").alias("rate_ppm"),
            (F.col("horizon_lsn") - F.col("last_lsn")).cast("bigint").alias("staleness"),
        )
        .withColumn(
            "priority", (F.col("rate_ppm") * F.col("staleness")).cast("bigint")
        )
    )
    w = Window.orderBy(F.desc("priority"), F.asc(url_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top)
    )


def recrawl_oracle_sql(changelog_cte: str, top: int = 100) -> str:
    """DuckDB restatement over the reconstructed stream (integer-exact)."""
    return f"""
        WITH ch AS ({changelog_cte}),
        per_url AS (
          SELECT url,
                 CAST(count(DISTINCT _ab_cdc_lsn) AS BIGINT) AS n_events,
                 CAST(min(_ab_cdc_lsn) AS BIGINT) AS first_lsn,
                 CAST(max(_ab_cdc_lsn) AS BIGINT) AS last_lsn,
                 max_by(_ab_cdc_deleted_at IS NOT NULL, _ab_cdc_lsn) AS dead
          FROM ch GROUP BY url),
        h AS (SELECT CAST(max(_ab_cdc_lsn) AS BIGINT) AS horizon_lsn FROM ch),
        s AS (
          SELECT url, n_events,
                 CAST(CASE WHEN last_lsn - first_lsn > 0
                      THEN (n_events - 1) * 1000000 // (last_lsn - first_lsn)
                      ELSE 0 END AS BIGINT) AS rate_ppm,
                 CAST(horizon_lsn - last_lsn AS BIGINT) AS staleness
          FROM per_url CROSS JOIN h
          WHERE NOT dead),
        r AS (
          SELECT url, n_events, rate_ppm, staleness,
                 CAST(rate_ppm * staleness AS BIGINT) AS priority,
                 row_number() OVER (
                   ORDER BY rate_ppm * staleness DESC, url ASC) AS rank
          FROM s)
        SELECT url, n_events, rate_ppm, staleness, priority,
               CAST(rank AS INT) AS rank
        FROM r WHERE rank <= {top}
    """


def allocate_fetch_budget(
    schedule: DataFrame,
    budget: int,
    url_col: str = "url",
    priority_col: str = "priority",
) -> DataFrame:
    """Apportion a global fetch budget across domains (crawl politeness):
    a frontier must not spend its whole budget on one hot site, so domain
    quotas are allocated proportionally to the domain's total priority
    mass using the LARGEST-REMAINDER method (Hamilton apportionment) —
    quota_d = floor(B·w_d / W) plus one extra slot for the domains with
    the largest remainders until exactly B slots are assigned. Within a
    domain, slots go to its highest-priority urls.

    Integer-exact throughout (remainders are B·w_d mod W — no doubles),
    ties by domain/url ascending → fully deterministic, oracle-checkable.

    Scale shape: per-domain weights are one map-side-combinable aggregate;
    the apportionment windows run over |domains| rows (tiny); the final
    per-domain slot ranking partitions by domain — hot domains are bounded
    by their quota, not their size. Domains whose quota exceeds their url
    count fetch everything they have (the slack is reported, not
    silently reassigned — re-run apportionment on the remainder if full
    budget use matters more than proportionality).
    """
    from airbyte_spark.functions.urls import url_domain

    per = schedule.select(
        url_domain(F.col(url_col)).alias("domain"),
        F.col(url_col),
        F.col(priority_col).cast("bigint"),
    )
    wall = Window.partitionBy()
    wts = per.groupBy("domain").agg(
        F.sum(priority_col).cast("bigint").alias("wp"),
        F.count(F.lit(1)).cast("bigint").alias("wn"),
    )
    # Zero total priority mass (e.g. a fresh corpus where every url has a
    # single observation → rate 0) falls back to uniform-by-url-count
    # weights: the loop must still spend its budget to gather the second
    # observations that make rates estimable, instead of stalling forever.
    wts = wts.withColumn("twp", F.sum("wp").over(wall)).select(
        "domain",
        F.when(F.col("twp") > 0, F.col("wp")).otherwise(F.col("wn")).alias("w"),
    )
    wts = wts.withColumn("tw", F.sum("w").over(wall)).filter(F.col("tw") > 0)
    wts = wts.select(
        "domain",
        "w",
        F.expr(f"{budget} * w DIV tw").alias("base"),
        F.expr(f"{budget} * w % tw").alias("rem"),
    )
    worder = Window.orderBy(F.desc("rem"), F.asc("domain"))
    quotas = wts.select(
        "domain",
        (
            F.col("base")
            + (
                F.row_number().over(worder)
                <= (F.lit(budget) - F.sum("base").over(wall))
            ).cast("bigint")
        ).alias("quota"),
    )
    wslot = Window.partitionBy("domain").orderBy(
        F.desc(priority_col), F.asc(url_col)
    )
    return (
        per.withColumn("slot", F.row_number().over(wslot).cast("int"))
        # no forced broadcast: quotas has one row per distinct domain, which
        # grows with the frontier (hundreds of millions at web scale) — AQE
        # broadcasts it at runtime only when it fits
        .join(quotas, "domain")
        .filter(F.col("slot") <= F.col("quota"))
        .select("domain", url_col, priority_col, "slot", F.col("quota").cast("bigint"))
    )


def fetch_budget_oracle_sql(schedule_sql: str, budget: int) -> str:
    """DuckDB restatement over a schedule CTE (must yield url, priority)."""
    return f"""
        WITH sched AS ({schedule_sql}),
        per AS (SELECT regexp_replace(
                         lower(regexp_extract(
                           url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
                         ':(80|443)$', '') AS domain,
                       url, CAST(priority AS BIGINT) AS priority
                FROM sched),
        wts AS (SELECT domain, CAST(sum(priority) AS BIGINT) AS wp,
                       CAST(count(*) AS BIGINT) AS wn
                FROM per GROUP BY domain),
        tots AS (SELECT CAST(sum(wp) AS BIGINT) AS twp FROM wts),
        wsel AS (SELECT domain,
                        CASE WHEN twp > 0 THEN wp ELSE wn END AS w
                 FROM wts CROSS JOIN tots),
        tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM wsel),
        ap AS (SELECT domain, w,
                      CAST({budget} * w // tw AS BIGINT) AS base,
                      CAST({budget} * w % tw AS BIGINT) AS rem
               FROM wsel CROSS JOIN tw WHERE tw > 0),
        q AS (SELECT domain,
                     CAST(base + CASE WHEN row_number() OVER (
                              ORDER BY rem DESC, domain ASC)
                            <= {budget} - (SELECT sum(base) FROM ap)
                          THEN 1 ELSE 0 END AS BIGINT) AS quota
              FROM ap),
        slots AS (SELECT domain, url, priority,
                         CAST(row_number() OVER (
                           PARTITION BY domain
                           ORDER BY priority DESC, url ASC) AS INT) AS slot
                  FROM per)
        SELECT s.domain, s.url, s.priority, s.slot, q.quota
        FROM slots s JOIN q USING (domain)
        WHERE s.slot <= q.quota
    """


# ---------------------------------------------------------------------------
# Sitemap discovery → frontier seeding
# ---------------------------------------------------------------------------

_SITEMAP_ENTRY_RE = r"<url>\s*<loc>[^<]+</loc>\s*(?:<rev>\d+</rev>\s*)?</url>"


def parse_sitemaps(
    df: DataFrame, xml_col: str = "sitemap_xml", domain_col: str = "domain"
) -> DataFrame:
    """Parse sitemap documents into (domain, url, sitemap_rev) entries.

    Scan-fused regex extraction (same pattern as the anchor-text operator):
    one pass pulls whole `<url>` entries, then per-entry column regexes
    pick the fields — no XML library, no Python. Entries without a
    revision marker default to rev 0 (sitemaps' optional lastmod ≡ our
    integer revision: the stream's own lsn clock, so frontier comparisons
    stay integer-exact). Malformed fragments simply don't match — a
    corrupt sitemap degrades to fewer entries, never an error, the same
    tolerance contract as the WARC parser."""
    entries = df.select(
        F.col(domain_col),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_SITEMAP_ENTRY_RE), 0)
        ).alias("entry"),
    )
    return entries.select(
        domain_col,
        F.regexp_extract(F.col("entry"), r"<loc>([^<]+)</loc>", 1).alias("url"),
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col("entry"), r"<rev>(\d+)</rev>", 1), F.lit("")
            ).cast("bigint"),
            F.lit(0),
        ).alias("sitemap_rev"),
    )


def frontier_from_sitemap(
    entries: DataFrame,
    state: DataFrame,
    url_col: str = "url",
    stored_rev_col: str = "_ab_cdc_lsn",
) -> DataFrame:
    """Diff announced sitemap entries against the ingested table: an entry
    seeds the fetch frontier iff the url is unknown ('new' — includes
    urls we tombstoned but the site still announces: re-discovery) or the
    site announces a revision newer than what we stored ('updated').

    ≡ the discover step of an incremental crawl: the sitemap is the
    source's own change manifest, and this is the same cursor comparison
    the incremental sync runs, keyed by url instead of stream position.

    Scale shape: one left join on url (both sides shuffle on the key;
    at 100 TB the state side is the lake table — bucket-pruned by the
    same url-hash layout the merge uses)."""
    st = state.select(
        F.col(url_col), F.col(stored_rev_col).cast("bigint").alias("_stored")
    )
    j = entries.join(st, url_col, "left")
    return (
        j.filter(F.col("_stored").isNull() | (F.col("sitemap_rev") > F.col("_stored")))
        .select(
            "domain",
            url_col,
            F.col("sitemap_rev").cast("bigint"),
            F.col("_stored").alias("stored_lsn"),
            F.when(F.col("_stored").isNull(), F.lit("new"))
            .otherwise(F.lit("updated"))
            .alias("reason"),
        )
    )
