"""HTML main-text extraction (functions/html.py, round 14): exact
planted-page extraction, boilerplate classes, malformed-markup
tolerance, the map-only plan contract, and the curation funnel's
``html_col`` rung (chrome differences must not defeat dedup)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.functions.html import (
    clean_html_text,
    extract_blocks,
    extract_main_text,
)


PAGE = """<html><head><title>My Site</title>
<script>var markup = "<p>fake paragraph inside a script string</p>";</script>
<style>.nav { color: red } /* <p>also fake</p> */</style></head>
<body><!-- tracking comment <p>still fake</p> -->
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<h1>Real Headline With Several Words</h1>
<p>The first body paragraph has plenty of ordinary prose words and an
entity: fish &amp; chips, plus <b>inline</b> <i>styling</i> that must
not split the block.</p>
<ul><li><a href="/x">tiny link</a></li><li><a href="/y">two words</a></li></ul>
<p>A second paragraph of genuine article content follows the list and
also survives extraction.</p>
<footer><a href="/t">Terms</a> | <a href="/p">Privacy</a> | <a href="/c">Cookies</a></footer>
</body></html>"""


def test_extraction_keeps_content_drops_boilerplate():
    text, kept, dropped = clean_html_text(PAGE)
    paras = text.split("\n")
    assert kept == 3 and paras[0] == "Real Headline With Several Words"
    assert paras[1].startswith("The first body paragraph")
    assert "fish & chips" in paras[1]  # entity decoded
    assert "inline styling" in paras[1]  # inline tags absorbed, not split
    assert paras[2].startswith("A second paragraph")
    # dropped: nav, two li links, footer — and NOTHING from script/style/
    # comment subtrees leaked (not even as dropped blocks)
    assert dropped == 4
    assert "fake" not in text and "tracking" not in text
    assert "Home" not in text and "Privacy" not in text


def test_malformed_markup_degrades_never_throws():
    # unclosed blocks, stray end tags, void elements, nested anchors
    blocks = extract_blocks(
        "<p>unclosed <p>next</b></span><br>after<hr><a>link <a>deep</a>"
    )
    assert [t for t, _ in blocks] == ["unclosed", "next", "after", "link deep"]
    assert blocks[3][1] == len("linkdeep")  # anchor chars counted once each
    assert clean_html_text("") == ("", 0, 0)
    assert clean_html_text("just bare text with no tags at all")[1] == 1
    # a script that never closes must not swallow the document silently
    assert clean_html_text("<script>var x = 1;")[0] == ""


def test_link_density_and_min_words_knobs():
    html = '<p><a href="/">four linked words here</a></p><p>two words</p>'
    # defaults: first block 100% linked -> dropped; second under min_words
    assert clean_html_text(html) == ("", 0, 2)
    # loosened knobs admit both
    text, kept, _ = clean_html_text(html, min_words=2, max_link_density=1.0)
    assert kept == 2 and text == "four linked words here\ntwo words"


def test_extract_main_text_is_map_only(spark):
    df = spark.createDataFrame(
        [(1, "<p>alpha beta gamma delta</p><nav><a href='/'>x y z</a></nav>")],
        "doc_id long, html string",
    )
    out = df.select("doc_id", extract_main_text("html").alias("e"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    row = out.select("doc_id", "e.text", "e.blocks_kept").head()
    assert (row[0], row[1], row[2]) == (1, "alpha beta gamma delta", 1)


def test_curation_funnel_html_rung(spark):
    """Two pages share IDENTICAL article text under DIFFERENT nav/footer
    chrome: without extraction their raw HTML differs (no dedup); with
    the html_col rung the funnel extracts first, so the exact-dedup rung
    collapses them (min id wins). A chrome-only page dies at the quality
    gate because its extracted text is empty."""
    from serverless_etl_bi_on_aws_spark.operators.curation import curation_stages

    article = (
        "<p>Genuine article content with plenty of distinct ordinary "
        "words forming a long enough paragraph to pass the quality "
        "threshold easily because variety matters greatly always.</p>"
    )
    chrome_a = '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
    chrome_b = '<footer><a href="/x">Terms</a> <a href="/y">Privacy</a> <a href="/z">Jobs</a></footer>'
    rows = [
        (1, f"<html><body>{chrome_a}{article}</body></html>"),
        (2, f"<html><body>{chrome_b}{article}</body></html>"),
        (3, f"<html><body>{chrome_a}{chrome_b}</body></html>"),  # chrome only
    ]
    docs = spark.createDataFrame(rows, "doc_id long, html string")
    quality, uniq, final = curation_stages(docs, html_col="html")
    assert {r["doc_id"] for r in quality.select("doc_id").collect()} == {1, 2}
    survivors = {r["doc_id"] for r in final.select("doc_id").collect()}
    assert survivors == {1}, "identical articles under different chrome must dedup"
    # with the rung the EXACT-dedup rung already collapses the pair
    # (extracted texts are string-identical) ...
    assert {r["doc_id"] for r in uniq.select("doc_id").collect()} == {1}
    # ... while on raw HTML the differing chrome defeats exact dedup
    # (only the fuzzy near-dup rung can still catch it downstream)
    _, raw_uniq, _ = curation_stages(
        docs.withColumnRenamed("html", "text"), quality_threshold=0.0
    )
    assert {r["doc_id"] for r in raw_uniq.select("doc_id").collect()} == {1, 2, 3}


@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_streaming_curation_html_rung(spark, tmp_path):
    """The streaming ingest loop accepts raw MARKUP (round 14,
    html_col=): extraction runs per micro-batch BEFORE the quality gate,
    so (a) a chrome-only page dies at the gate, (b) a cross-batch page
    sharing an article under different chrome is dropped by the index
    probe (content-true dedup), (c) different articles under identical
    chrome are NOT near-dups, and (d) the curated corpus stores the
    extracted text, not markup."""
    import os

    from serverless_etl_bi_on_aws_spark.operators.dedup_index import (
        init_minhash_index,
    )
    from serverless_etl_bi_on_aws_spark.streaming.ingest_dedup import (
        start_incremental_curation,
    )

    def article(tag):
        words = " ".join(f"{tag}word{i} detail{i}" for i in range(20))
        return f"<p>Genuine {tag} article body with many distinct words {words}</p>"

    chrome_a = '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
    chrome_b = '<footer><a href="/x">Terms</a> <a href="/y">Privacy</a> <a href="/z">Jobs</a></footer>'
    b1 = [
        (1, f"<html><body>{chrome_a}{article('alpha')}</body></html>"),
        (3, f"<html><body>{chrome_a}{chrome_b}</body></html>"),  # chrome only
    ]
    b2 = [
        (2, f"<html><body>{chrome_b}{article('alpha')}</body></html>"),  # dup of 1
        (4, f"<html><body>{chrome_a}{article('beta')}</body></html>"),  # new
    ]
    land = tmp_path / "landing"
    land.mkdir()
    schema = "doc_id long, html string"
    for i, rows in enumerate((b1, b2)):
        src = tmp_path / f"f{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))
        part = next(p for p in os.listdir(src) if p.endswith(".parquet"))
        os.rename(src / part, land / f"batch{i}.parquet")

    idx = str(tmp_path / "idx")
    init_minhash_index(idx)
    q = start_incremental_curation(
        spark,
        str(land),
        idx,
        str(tmp_path / "clean"),
        schema=spark.createDataFrame([], schema).schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        html_col="html",
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "clean"))
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {1, 4}
    texts = {r["doc_id"]: r["text"] for r in got.select("doc_id", "text").collect()}
    assert "<" not in texts[1] and texts[1].startswith("Genuine alpha article")
