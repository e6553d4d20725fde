"""Robots-rules compliance filter: parser groups, longest-match, defaults."""

from __future__ import annotations

import pyspark.sql.functions as F

from airbyte_spark.operators.robots import apply_robots_rules, parse_robots_txt

ROBOTS = """
# crawler policy
User-agent: *
Disallow: /private/
Allow: /private/press/
Disallow: /tmp

User-agent: specialbot
Disallow: /
"""


def test_parse_groups_and_agent_selection():
    rules = parse_robots_txt("d.example.com", ROBOTS)
    assert {(r["path_prefix"], r["allow"]) for r in rules} == {
        ("/private/", False),
        ("/private/press/", True),
        ("/tmp", False),
    }
    special = parse_robots_txt("d.example.com", ROBOTS, user_agent="SpecialBot")
    assert [(r["path_prefix"], r["allow"]) for r in special] == [("/", False)]


def test_parse_consecutive_agents_share_group():
    body = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_txt("d", body, "b") == [
        {"domain": "d", "path_prefix": "/x", "allow": False}
    ]
    assert parse_robots_txt("d", body, "zzz") == []  # no '*' group


def test_longest_prefix_and_defaults(spark):
    rules = spark.createDataFrame(
        [
            ("a.example.com", "/private/", False),
            ("a.example.com", "/private/press/", True),
            ("b.example.com", "/", False),
        ],
        ["domain", "path_prefix", "allow"],
    )
    pages = spark.createDataFrame(
        [
            ("https://a.example.com/private/x.html",),   # disallow
            ("https://a.example.com/private/press/1",),  # longer allow wins
            ("https://a.example.com/public/ok",),        # no match -> allow
            ("https://a.example.com/",),                 # bare root, no match
            ("https://b.example.com/anything",),         # blanket disallow
            ("https://c.example.com/whatever",),         # unknown domain
        ],
        ["url"],
    )
    got = {
        r["url"]: r["robots_allowed"]
        for r in apply_robots_rules(pages, rules).collect()
    }
    assert got == {
        "https://a.example.com/private/x.html": False,
        "https://a.example.com/private/press/1": True,
        "https://a.example.com/public/ok": True,
        "https://a.example.com/": True,
        "https://b.example.com/anything": False,
        "https://c.example.com/whatever": True,  # no rules for the domain
    }


def test_allow_wins_equal_length_tie(spark):
    rules = spark.createDataFrame(
        [("t.example.com", "/abc", False), ("t.example.com", "/abc", True)],
        ["domain", "path_prefix", "allow"],
    )
    pages = spark.createDataFrame([("https://t.example.com/abc/д",)], ["url"])
    (row,) = apply_robots_rules(pages, rules).collect()
    assert row["robots_allowed"] is True


def test_plan_is_broadcast_and_keeps_all_rows(spark):
    rules = spark.createDataFrame(
        [("a.example.com", "/x", False)], ["domain", "path_prefix", "allow"]
    )
    pages = spark.range(100).select(
        F.concat(F.lit("https://a.example.com/p/"), F.col("id").cast("string")).alias("url")
    )
    out = apply_robots_rules(pages, rules)
    assert out.count() == 100
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
