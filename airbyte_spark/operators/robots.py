"""Robots-rules compliance filter for crawl corpora.

A web-scale training pipeline must be able to answer "which of these
pages would robots.txt have disallowed?" — both for polite recrawl
planning and for compliance-driven corpus filtering (the C4/CCBot
takedown model). The reference has no analog; this is a first-class
crawl-curation operator.

Semantics follow RFC 9309 (the Google/REP rules):

  * rules are (domain, path_prefix, allow) — a parsed robots.txt group
    for the crawler's user-agent;
  * the LONGEST matching prefix decides; allow wins ties at equal length
    (RFC 9309 §2.2.2);
  * no matching rule → allowed (and unknown domains are allowed).

Scale shape: the rules side is small by construction (one robots.txt per
domain, a few lines each — MBs for the whole web), so it broadcasts; the
page side takes one map-side equi-join on domain plus a per-url max_by
aggregate over its few matched rules. No shuffle of page bodies: the
filter runs on (url, domain, path) only and the verdict joins back by
url — or, in the fused form, rides the same select.

parse_robots_txt is a driver-side helper for real robots.txt bytes
(tests exercise it); at deployment the parsed rules table is refreshed by
its own small job and stored as parquet keyed by domain.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from airbyte_spark.functions.urls import url_domain


def parse_robots_txt(domain: str, body: str, user_agent: str = "*") -> list[dict]:
    """robots.txt bytes → [(domain, path_prefix, allow)] for one agent.

    Minimal RFC 9309 group parsing: collects the group(s) whose
    User-agent matches `user_agent` exactly or '*', most-specific group
    wins (exact-match group present → '*' groups ignored).
    """
    groups: list[tuple[list[str], list[dict]]] = []
    agents: list[str] = []
    rules: list[dict] = []
    header_open = False  # True while consecutive User-agent lines accrue
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not header_open and (agents or rules):
                groups.append((agents, rules))  # a UA line after rules opens a new group
                agents, rules = [], []
            agents.append(val.lower())
            header_open = True
        elif key in ("allow", "disallow"):
            header_open = False
            if val:  # empty Disallow: = allow everything (no rule)
                rules.append(
                    {"domain": domain, "path_prefix": val, "allow": key == "allow"}
                )
    if agents or rules:
        groups.append((agents, rules))
    exact = [r for a, rs in groups if user_agent.lower() in a for r in rs]
    if exact:
        return exact
    return [r for a, rs in groups if "*" in a for r in rs]


def apply_robots_rules(
    pages: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Stamp each page with `robots_allowed` per longest-prefix-match.

    rules: (domain, path_prefix, allow). Returns pages + robots_allowed
    (boolean, never NULL). Compose with .filter("robots_allowed") for the
    compliance cut, or keep the column for audit splits.
    """
    dom = url_domain(F.col(url_col))
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(.*)$", 1),
            F.lit(""),
        ),
        F.lit("/"),
    )
    keyed = pages.withColumn("_dom", dom).withColumn("_path", path)
    r = rules.select(
        F.col("domain").alias("_dom"),
        F.col("path_prefix").alias("_prefix"),
        F.col("allow").alias("_allow"),
    )
    matched = (
        keyed.select(url_col, "_dom", "_path")
        # no forced broadcast: the rule set is one row per (domain, prefix)
        # and grows with crawled domains — defer to AQE's runtime estimate
        .join(r, on="_dom", how="inner")
        .filter(F.col("_path").startswith(F.col("_prefix")))
        .groupBy(url_col)
        .agg(
            # longest prefix decides; allow wins length ties (RFC 9309):
            # order by (length, allow) so the max picks allow at equal length
            F.max_by(
                F.col("_allow"),
                F.struct(
                    F.length("_prefix").alias("l"),
                    F.col("_allow").cast("int").alias("a"),
                ),
            ).alias("_verdict")
        )
    )
    return (
        keyed.join(matched, on=url_col, how="left")
        .withColumn("robots_allowed", F.coalesce("_verdict", F.lit(True)))
        .drop("_dom", "_path", "_verdict")
    )
