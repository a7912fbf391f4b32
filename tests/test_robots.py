"""robots.txt parsing + filtering (functions/robots.py): RFC 9309 group
selection, longest-match precedence, tolerance, the rules-but-no-match
regression, retroactive-removal direction, and the broadcast/slim plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.functions.robots import (
    parse_robots,
    robots_filter,
    robots_rules,
)

_TXT = (
    "# comment\n"
    "User-agent: googlebot\n"
    "Disallow: /google-only\n"
    "\n"
    "User-agent: a\n"
    "User-agent: b\n"
    "Disallow: /shared\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Disallow:\n"
    "Disallow: /tmp/*junk\n"
    "garbage line without colon meaning\n"
    "Crawl-delay: 10\n"
)


def test_parse_groups_and_tolerance():
    # star group: empty Disallow dropped, wildcard cut conservatively
    assert parse_robots(_TXT, "*") == [
        (False, "/private"), (True, "/private/ok"), (False, "/tmp/"),
    ]
    # specific group REPLACES star (RFC 9309), case-insensitive
    assert parse_robots(_TXT, "GoogleBot") == [(False, "/google-only")]
    # consecutive agent lines share a group
    assert parse_robots(_TXT, "a") == parse_robots(_TXT, "b") == [(False, "/shared")]
    # no groups at all -> no rules
    assert parse_robots("", "*") == []
    assert parse_robots(None, "*") == []
    # rules before any User-agent line are ignored
    assert parse_robots("Disallow: /x\n", "*") == []


def _setup(spark):
    robots = spark.createDataFrame(
        [("ex.com", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n")],
        "domain string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [
            (0, "http://ex.com/public"),        # no match -> allowed
            (1, "http://ex.com/private/x"),     # Disallow -> denied
            (2, "http://ex.com/private/okay"),  # longer Allow wins -> allowed
            (3, "http://other.org/private/x"),  # no robots -> allowed
            (4, "not a url"),                   # malformed -> denied
            (5, "http://ex.com"),               # empty path -> "/" -> allowed
        ],
        "doc_id bigint, url string",
    )
    return docs, robots_rules(robots)


def test_filter_decisions(spark):
    docs, rules = _setup(spark)
    allowed = {r.doc_id for r in robots_filter(docs, "url", rules).collect()}
    denied = {r.doc_id for r in
              robots_filter(docs, "url", rules, keep="denied").collect()}
    assert allowed == {0, 2, 3, 5}
    assert denied == {1, 4}
    assert allowed | denied == {0, 1, 2, 3, 4, 5} and not (allowed & denied)
    with pytest.raises(ValueError, match="keep"):
        robots_filter(docs, "url", rules, keep="everything")


def test_rules_but_no_match_domain_is_allowed(spark):
    """Regression: a doc on a domain WITH rules, none of which match its
    path, must survive (the join-then-filter shape would drop it)."""
    docs, rules = _setup(spark)
    only = docs.filter("doc_id = 0")
    assert robots_filter(only, "url", rules).count() == 1


def test_equal_length_allow_beats_disallow(spark):
    robots = spark.createDataFrame(
        [("ex.com", "User-agent: *\nDisallow: /p\nAllow: /p\n")],
        "domain string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [(1, "http://ex.com/page")], "doc_id bigint, url string"
    )
    assert robots_filter(docs, "url", robots_rules(robots)).count() == 1


def test_agent_specific_rules(spark):
    robots = spark.createDataFrame(
        [("ex.com", "User-agent: mybot\nDisallow: /\n\nUser-agent: *\nAllow: /\n")],
        "domain string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [(1, "http://ex.com/a")], "doc_id bigint, url string"
    )
    assert robots_filter(docs, "url", robots_rules(robots, agent="mybot")).count() == 0
    assert robots_filter(docs, "url", robots_rules(robots, agent="elsebot")).count() == 1


def test_rule_join_broadcasts(spark):
    docs, rules = _setup(spark)
    plan = (
        robots_filter(docs, "url", rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_rules_domain_normalizes_like_the_url_side(spark):
    """r14 ADVICE (medium): a robots corpus keyed by the natural fetch
    host (mixed case, full www host) must still match its documents —
    unnormalized, every rule silently dropped and everything read as
    ALLOWED, the unsafe direction for an exclusion-honoring filter."""
    robots = spark.createDataFrame(
        [("WWW.Example.com", "User-agent: *\nDisallow: /\n")],
        "domain string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [
            (0, "http://example.com/x"),
            (1, "http://sub.example.com/y"),  # scope collapses to registered domain
            (2, "http://unrelated.org/z"),
        ],
        "doc_id bigint, url string",
    )
    rules = robots_rules(robots)
    kept = sorted(r.doc_id for r in robots_filter(docs, "url", rules).collect())
    assert kept == [2]


def test_wildcard_allow_dropped_not_truncated(spark):
    """r14 ADVICE (low): truncating 'Allow: /a*x' to '/a' ties the
    'Disallow: /a' at equal length and Allow WINS — permitting the whole
    /a subtree RFC 9309 denies. Conservative per direction: the
    wildcard Allow is dropped, the wildcard Disallow keeps its prefix."""
    txt = "User-agent: *\nDisallow: /a\nAllow: /a*x\n"
    assert parse_robots(txt, "*") == [(False, "/a")]
    robots = spark.createDataFrame(
        [("ex.com", txt)], "domain string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [(0, "http://ex.com/a/b"), (1, "http://ex.com/other")],
        "doc_id bigint, url string",
    )
    kept = sorted(
        r.doc_id
        for r in robots_filter(docs, "url", robots_rules(robots)).collect()
    )
    assert kept == [1]


def test_exact_host_rules_are_not_merged_across_hosts(spark):
    """r15 ADVICE (medium): www/blog/apex robots.txt are DISTINCT
    origins under RFC 9309. Collapsing rule domains to the registered
    domain merged their rule sets, so a longer Allow from host B could
    clear a page host A's own robots.txt forbids — the unsafe
    direction. A doc whose exact host has rules is judged by those
    rules alone."""
    robots = spark.createDataFrame(
        [
            ("a.ex.com", "User-agent: *\nDisallow: /private\n"),
            ("b.ex.com", "User-agent: *\nDisallow: /x\nAllow: /private/ok\n"),
        ],
        "domain string, robots_txt string",
    )
    rules = robots_rules(robots)
    docs = spark.createDataFrame(
        [
            # a's own Disallow /private must hold — b's longer Allow
            # /private/ok must NOT leak across hosts
            (0, "http://a.ex.com/private/okay"),
            (1, "http://b.ex.com/private/okay"),   # b's own Allow wins
            (2, "http://b.ex.com/x/1"),            # b's own Disallow
            (3, "http://a.ex.com/x/1"),            # a has no /x rule
            # no robots row for this host: registered-domain fallback
            # (the merged scope) applies
            (4, "http://c.ex.com/private/okay"),
            (5, "http://c.ex.com/private/no"),
        ],
        "doc_id bigint, url string",
    )
    kept = {r.doc_id for r in robots_filter(docs, "url", rules).collect()}
    assert kept == {1, 3, 4}


def test_empty_agent_group_host_does_not_inherit_sibling_rules(spark):
    """A host whose robots.txt yields NO rules for this agent allows
    everything — the sentinel row pins its exact-host tier so it must
    not inherit a sibling host's Disallow through the domain
    fallback."""
    robots = spark.createDataFrame(
        [
            ("a.ex.com", "User-agent: *\nDisallow: /\n"),
            ("d.ex.com", "User-agent: otherbot\nDisallow: /\n"),
        ],
        "domain string, robots_txt string",
    )
    rules = robots_rules(robots)
    docs = spark.createDataFrame(
        [
            (0, "http://d.ex.com/anything"),  # d's file is empty for *: allowed
            (1, "http://a.ex.com/anything"),  # a's own Disallow: denied
            (2, "http://e.ex.com/anything"),  # no row: fallback merges a+d -> denied
        ],
        "doc_id bigint, url string",
    )
    kept = {r.doc_id for r in robots_filter(docs, "url", rules).collect()}
    assert kept == {0}
