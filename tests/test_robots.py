"""robots.txt crawl filtering (RFC 9309): group selection, wildcard
matching, longest-match/allow-wins precedence, and the broadcast-join
Spark surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seekstorm_spark.functions.robots import (
    filter_by_robots,
    parse_robots,
    robots_allowed,
    url_path,
)

ROBOTS = """\
# crawler policy
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /dir/
Allow: /dir/ok
Disallow: /*.php$
Allow: /fish*.html
Disallow: /fish
"""


def test_group_selection():
    star = parse_robots(ROBOTS, "mybot/1.0")
    assert ("/dir/", False) in star and ("/private/", False) not in star
    goog = parse_robots(ROBOTS, "Googlebot/2.1")
    assert goog == (("/private/", False),)
    # no groups at all / empty text -> everything allowed
    assert parse_robots("", "*") == ()
    assert parse_robots(None, "*") == ()
    # empty Disallow value matches nothing
    assert parse_robots("User-agent: *\nDisallow:", "*") == ()


def test_precedence_longest_match_allow_wins():
    r = parse_robots(ROBOTS, "*")
    assert robots_allowed("/", r)
    assert not robots_allowed("/dir/page", r)
    assert robots_allowed("/dir/okstuff", r)  # longer Allow wins
    assert not robots_allowed("/x/y.php", r)  # $-anchored wildcard
    assert robots_allowed("/x/y.php?q=1", r)  # not at end -> no match
    assert robots_allowed("/fishy.html", r)  # /fish*.html beats /fish
    assert not robots_allowed("/fishy", r)
    # exact tie: Allow wins (RFC 9309 §2.2.2)
    t = parse_robots("User-agent: *\nDisallow: /p\nAllow: /p", "*")
    assert robots_allowed("/p", t)


def test_url_path_extraction():
    assert url_path("https://Host.example/a/b?q=1#frag") == "/a/b?q=1"
    assert url_path("http://host.example") == "/"
    assert url_path("/already/a/path") == "/already/a/path"


def test_filter_by_robots_spark(spark):
    pages = spark.createDataFrame(
        [
            (0, "a.test", "http://a.test/dir/blocked"),
            (1, "a.test", "http://a.test/dir/okfine"),
            (2, "a.test", "http://a.test/open"),
            (3, "b.test", "http://b.test/dir/anything"),  # no robots row
        ],
        "doc_id long, host string, url string",
    )
    robots = spark.createDataFrame(
        [("a.test", ROBOTS)], "host string, robots_txt string"
    )
    kept = {
        r["doc_id"]
        for r in filter_by_robots(pages, robots).select("doc_id").collect()
    }
    assert kept == {1, 2, 3}
    flagged = {
        r["doc_id"]: r["allowed"]
        for r in filter_by_robots(pages, robots, keep_flag=True).collect()
    }
    assert flagged == {0: False, 1: True, 2: True, 3: True}
    # the robots side must be broadcast (page side shuffle-free)
    plan = filter_by_robots(pages, robots)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_agent_specific_filtering(spark):
    pages = spark.createDataFrame(
        [(0, "a.test", "http://a.test/private/x")],
        "doc_id long, host string, url string",
    )
    robots = spark.createDataFrame(
        [("a.test", ROBOTS)], "host string, robots_txt string"
    )
    assert filter_by_robots(pages, robots, agent="googlebot").count() == 0
    assert filter_by_robots(pages, robots, agent="otherbot").count() == 1
