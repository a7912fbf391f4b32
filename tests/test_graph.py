"""Link graph + fixed-point PageRank (operators/graph.py,
functions/html.extract_link_hrefs) — extraction contracts, the exact
integer recurrence against a hand-computed reference, dangling/self-loop
rules, and the plan shapes the scale claims rest on."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.functions.html import extract_link_hrefs
from serverless_etl_bi_on_aws_spark.operators.graph import (
    extract_link_edges,
    pagerank_fixedpoint,
    rank_column,
)


# ---------------------------------------------------------------- hrefs

def test_extract_hrefs_order_and_filters():
    html = (
        '<a href="http://a/1">x</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="#top">frag</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a name="anchor-no-href">named</a>'
        '<a href="http://a/2#sec">y</a>'
        '<a href="http://a/1">dup kept here</a>'
    )
    # order preserved, dup kept (dedup is the graph builder's job),
    # fragment stripped, non-navigable schemes dropped
    assert extract_link_hrefs(html) == ["http://a/1", "http://a/2", "http://a/1"]


def test_extract_hrefs_relative_resolution():
    base = "http://ex.com/dir/page.html"
    html = '<a href="other.html">r</a><a href="/root">a</a><a href="../up">u</a>'
    assert extract_link_hrefs(html, base) == [
        "http://ex.com/dir/other.html",
        "http://ex.com/root",
        "http://ex.com/up",
    ]


def test_extract_hrefs_skips_dropped_subtrees_and_script_text():
    html = (
        '<head><a href="http://a/head">h</a></head>'
        '<script>var s = "<a href=\\"http://a/script\\">s</a>";</script>'
        '<svg><a href="http://a/svg">v</a></svg>'
        '<body><a href="http://a/body">b</a></body>'
    )
    assert extract_link_hrefs(html) == ["http://a/body"]


def test_extract_hrefs_malformed_tolerance():
    # unclosed tags, stray brackets, truncated entity: never throws
    assert extract_link_hrefs('<a href="http://a/x">y<b><<< &#x') == ["http://a/x"]
    assert extract_link_hrefs("") == []
    assert extract_link_hrefs(None) == []


# ---------------------------------------------------------------- edges

def test_extract_link_edges_dedup_selfloop_and_plan(spark):
    df = spark.createDataFrame(
        [
            ("http://h/a", '<a href="http://h/b">1</a><a href="http://h/b">2</a>'
                           '<a href="http://h/a">self</a>'),
            ("http://h/b", '<a href="c">rel</a>'),
        ],
        "url string, html string",
    )
    edges = extract_link_edges(df, html_col="html", url_col="url")
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == {("http://h/a", "http://h/b"), ("http://h/b", "http://h/c")}
    # exactly ONE exchange: the distinct (extraction itself is map-only)
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # hash exchange (+AQE read), no join


# ------------------------------------------------------------- pagerank

def _reference_pagerank(edges, n_iter=3, damping_ppm=850_000):
    """Independent driver-side reference: same integer recurrence, plain
    Python dicts (no Spark)."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    base = 1_000_000 - damping_ppm
    for _ in range(n_iter):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += r[s] // outdeg[s]
        r = {n: base + (damping_ppm * contrib[n]) // 1_000_000 for n in nodes}
    return r


def test_pagerank_matches_reference_recurrence(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),  # d is a source-only node
        ("c", "e"),  # e is dangling (no outlinks): mass dropped
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank_ppm for r in pagerank_fixedpoint(df, n_iter=3).collect()}
    assert got == _reference_pagerank(edges, n_iter=3)
    # the hub c (3 in-links) outranks everything; dangling e got fed by c
    assert got["c"] == max(got.values())
    assert got["e"] > got["d"]  # d has no in-links at all -> base+0


def test_pagerank_no_inlink_node_gets_base_rank(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.node: r.rank_ppm for r in pagerank_fixedpoint(df, n_iter=5).collect()}
    assert got["a"] == 150_000  # base only, every iteration


def test_pagerank_is_deterministic_across_partitionings(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 50}") for i in range(200)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r1 = {r.node: r.rank_ppm for r in
          pagerank_fixedpoint(df.repartition(1), n_iter=3).collect()}
    r2 = {r.node: r.rank_ppm for r in
          pagerank_fixedpoint(df.repartition(16), n_iter=3).collect()}
    assert r1 == r2  # integer sums are order-independent


def test_pagerank_tracks_float_pagerank_closely():
    """The fixed-point recurrence is a quality SIGNAL: its ppm ranks stay
    within 1 ppm-per-step truncation error of the exact rational/float
    recurrence it discretizes."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    ints = _reference_pagerank(edges, n_iter=3)
    # exact rational recurrence (no truncation)
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {"a": 2, "b": 1, "c": 1}
    r = {n: Fraction(1) for n in nodes}
    for _ in range(3):
        contrib = {n: Fraction(0) for n in nodes}
        for s, d in set(edges):
            contrib[d] += r[s] / outdeg[s]
        r = {n: Fraction(15, 100) + Fraction(85, 100) * contrib[n] for n in nodes}
    for n in nodes:
        assert abs(ints[n] - float(r[n]) * 1e6) < 10  # few-ppm truncation drift


def test_pagerank_validates_knobs(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    import pytest

    with pytest.raises(ValueError, match="n_iter"):
        pagerank_fixedpoint(df, n_iter=0)
    with pytest.raises(ValueError, match="damping_ppm"):
        pagerank_fixedpoint(df, damping_ppm=2_000_000)


def test_rank_column_defaults_for_unlinked_pages(spark):
    edges = spark.createDataFrame([("u1", "u2")], "src string, dst string")
    ranks = pagerank_fixedpoint(edges, n_iter=2)
    docs = spark.createDataFrame(
        [("u1", "t1"), ("u2", "t2"), ("u9", "never linked")],
        "url string, text string",
    )
    out = {r.url: r.rank_ppm for r in
           rank_column(docs, ranks, url_col="url").collect()}
    assert out["u9"] == 150_000  # the rank of an unlinked node
    assert out["u2"] > out["u1"]
    # join preserved every corpus row
    assert len(out) == 3
