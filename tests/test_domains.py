"""Domain-level curation (functions/url.registered_domain,
operators/domains.py): the PSL-lite rule, blocklist semantics, stats
conservation, the deterministic share cap, and the broadcast/no-UDF plan
shapes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.functions.url import registered_domain
from serverless_etl_bi_on_aws_spark.operators.domains import (
    cap_domain_share,
    domain_stats,
    filter_blocked_domains,
)


def _dom(spark, url):
    return spark.range(1).select(
        registered_domain(F.lit(url))
    ).first()[0]


def test_registered_domain_rule(spark):
    cases = {
        "http://news.com/a": "news.com",
        "http://www.news.com/a": "news.com",           # www is just a label
        "https://a.b.deep.news.com/x": "news.com",     # deep subdomain collapses
        "http://news.co.uk/": "news.co.uk",            # two-label suffix -> 3 labels
        "http://blog.news.co.uk/": "news.co.uk",
        "https://CAPS.NeWs.CoM/": "news.com",          # case-insensitive
        "http://localhost/x": "localhost",             # single-label host
        "http://co.uk/": "co.uk",                      # bare suffix: no 3rd label
        "http://example.com.au/": "example.com.au",
        "not a url": None,
        "": None,
    }
    for url, want in cases.items():
        assert _dom(spark, url) == want, url


def test_registered_domain_is_jvm_only(spark):
    df = spark.range(5).select(
        F.concat(F.lit("http://h"), F.col("id"), F.lit(".org/")).alias("u")
    ).select(registered_domain("u"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan


def _corpus(spark):
    rows = [
        (0, "http://good.com/a", "alpha beta"),
        (1, "http://www.good.com/b", "gamma"),
        (2, "http://evil.bad/x", "spam spam"),
        (3, "http://sub.evil.bad/y", "more spam"),
        (4, "broken", "orphan text"),
        (5, "http://other.org/", "delta epsilon zeta"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, url string, text string")


def test_filter_blocked_domains_semantics(spark):
    out = {r.doc_id for r in
           filter_blocked_domains(_corpus(spark), "url", ["Evil.BAD"]).collect()}
    # subdomain of a blocked domain is blocked too; invalid url dropped
    assert out == {0, 1, 5}
    kept = {r.doc_id for r in
            filter_blocked_domains(
                _corpus(spark), "url", ["evil.bad"], keep_invalid=True
            ).collect()}
    assert kept == {0, 1, 4, 5}


def test_filter_blocked_accepts_dataframe_and_broadcasts(spark):
    bl = spark.createDataFrame([("EVIL.bad",)], "d string")
    surv = filter_blocked_domains(_corpus(spark), "url", bl)
    assert {r.doc_id for r in surv.collect()} == {0, 1, 5}
    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_domain_stats_conserves_corpus(spark):
    stats = {r.domain: (r.docs, r.total_tokens)
             for r in domain_stats(_corpus(spark), "url", "text").collect()}
    assert stats["good.com"] == (2, 3)
    assert stats["evil.bad"] == (2, 4)
    assert stats["other.org"] == (1, 3)
    assert stats[None] == (1, 2)  # malformed url aggregates under NULL
    assert sum(d for d, _ in stats.values()) == 6


def test_cap_domain_share_deterministic_and_counts(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("http://dom"), F.pmod(F.col("id"), F.lit(3)), F.lit(".com/p")
        ).alias("url"),
    )
    capped = cap_domain_share(docs, "url", max_docs_per_domain=10)
    counts = {r.domain: r.docs for r in domain_stats(capped, "url").collect()}
    assert all(v == 10 for v in counts.values()) and len(counts) == 3
    # deterministic: same selection regardless of partitioning
    a = sorted(r.doc_id for r in capped.collect())
    b = sorted(
        r.doc_id
        for r in cap_domain_share(
            docs.repartition(17), "url", max_docs_per_domain=10
        ).collect()
    )
    assert a == b
    # under-cap domains and invalid urls pass through untouched
    few = spark.createDataFrame(
        [(1, "http://a.com/"), (2, "http://a.com/"), (3, "nope")],
        "doc_id bigint, url string",
    )
    assert {r.doc_id for r in
            cap_domain_share(few, "url", 5).collect()} == {1, 2, 3}
    with pytest.raises(ValueError, match="max_docs_per_domain"):
        cap_domain_share(few, "url", 0)
