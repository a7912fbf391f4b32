"""Curation funnel stage semantics — operators/curation.py.

The sf fixture has no exact-duplicate texts, so q81's oracle compare
never exercises the exact-dedup stage's drop path; these tests plant
docs that hit every stage."""

from __future__ import annotations

import pytest

from serverless_etl_bi_on_aws_spark.operators.curation import (
    curation_report,
    curation_stages,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronomers catalogue distant variable stars using automated "
    "telescopes during long winter observation campaigns across chile"
)
GOOD2 = (
    "market analysts reviewed quarterly earnings reports from twelve "
    "industrial manufacturers before revising their annual growth "
    "projections downward amid persistent supply chain disruptions"
)
LOW_QUALITY = "a a a a a a a a"  # degenerate repetition + short tokens


def _docs(spark):
    near_dup = GOOD + " extra trailing clause appended"
    rows = [
        (1, "s1", GOOD),
        (2, "s1", GOOD),  # exact dup of 1 -> dropped at uniq (min id wins)
        (3, "s1", near_dup),  # near dup of 1 -> dropped at final (id_2)
        (4, "s2", GOOD2),
        (5, "s2", LOW_QUALITY),  # dropped at quality
    ]
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def test_stages_drop_at_the_right_rung(spark):
    quality, uniq, final = curation_stages(_docs(spark))
    assert {r.doc_id for r in quality.select("doc_id").collect()} == {1, 2, 3, 4}
    assert {r.doc_id for r in uniq.select("doc_id").collect()} == {1, 3, 4}
    assert {r.doc_id for r in final.select("doc_id").collect()} == {1, 4}


def test_exact_dup_keeps_min_id(spark):
    docs = _docs(spark).union(
        _docs(spark).sparkSession.createDataFrame(
            [(0, "s3", GOOD2)], "doc_id bigint, source string, text string"
        )
    )
    _, uniq, _ = curation_stages(docs)
    kept = {r.doc_id for r in uniq.select("doc_id").collect()}
    assert 0 in kept and 4 not in kept  # GOOD2 now keeps id 0, not 4


def test_report_counts_and_zero_group(spark):
    rep = {r["source"]: r.asDict() for r in curation_report(_docs(spark)).collect()}
    assert rep["s1"]["n_raw"] == 3
    assert rep["s1"]["n_quality"] == 3
    assert rep["s1"]["n_unique"] == 2
    assert rep["s1"]["n_final"] == 1
    assert rep["s1"]["tokens_final"] == len(GOOD.split(" "))
    assert rep["s2"] == {
        "source": "s2",
        "n_raw": 2,
        "n_quality": 1,
        "n_unique": 1,
        "n_final": 1,
        "tokens_final": len(GOOD2.split(" ")),
    }
    # a group that loses everything still reports, with zeros
    docs = _docs(spark).union(
        _docs(spark).sparkSession.createDataFrame(
            [(9, "s9", LOW_QUALITY)], "doc_id bigint, source string, text string"
        )
    )
    rep9 = {r["source"]: r.asDict() for r in curation_report(docs).collect()}
    assert rep9["s9"] == {
        "source": "s9",
        "n_raw": 1,
        "n_quality": 0,
        "n_unique": 0,
        "n_final": 0,
        "tokens_final": 0,
    }


def test_dominance_rule_is_order_independent(spark):
    """Renumbering ids reverses which side of each near-dup pair drops,
    but the survivor COUNT is stable (dominance drops every id_2)."""
    base = _docs(spark)
    flipped = base.selectExpr("(100 - doc_id) AS doc_id", "source", "text")
    _, _, f1 = curation_stages(base)
    _, _, f2 = curation_stages(flipped)
    assert f1.count() == f2.count()


@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_minhash_neardup_strategy(spark):
    """The neardup='minhash' knob (round-10 verdict #3 — the funnel's
    100 TB near-dup shape): planted near-dups are caught through the
    banded-LSH path (the q13 recall contract at these shingle overlaps),
    the earlier rungs are UNCHANGED (quality/uniq identical to exact),
    stage monotonicity holds, and the report composes. An unknown
    strategy fails loudly."""
    import pytest

    from serverless_etl_bi_on_aws_spark.operators.dedup import neardup_jaccard_pairs

    docs = _docs(spark)
    qe, ue, fe = curation_stages(docs, neardup="exact")
    qm, um, fm = curation_stages(docs, neardup="minhash")
    ids = lambda df: {r.doc_id for r in df.select("doc_id").collect()}  # noqa: E731
    assert ids(qm) == ids(qe) and ids(um) == ids(ue)
    # the planted near-dup pair (1,3) has Jaccard ~0.87 at 3-shingles —
    # well up the S-curve: minhash catches it, and the funnel output
    # matches the exact strategy on this corpus
    assert ids(fm) == ids(fe) == {1, 4}
    assert ids(fm) <= ids(um) <= ids(qm)  # monotone rungs

    rep = {
        r["source"]: r.asDict()
        for r in curation_report(docs, neardup="minhash").collect()
    }
    assert rep["s1"]["n_final"] == 1 and rep["s2"]["n_final"] == 1

    with pytest.raises(ValueError, match="neardup"):
        curation_stages(docs, neardup="simhash")

    # sanity on the planted pair's true overlap: the exact pair set the
    # estimate must recall (the q13 contract's premise)
    pairs = {
        (r.id_1, r.id_2)
        for r in neardup_jaccard_pairs(ue, threshold=0.35).collect()
    }
    assert (1, 3) in pairs


def test_q81_plan_is_jvm_only_and_pruned(spark):
    """The funnel's hot path must stay inside whole-stage codegen: no
    Python eval stages anywhere (quality scoring and shingling are
    built-in expressions), and the report-side scans prune to the
    columns they aggregate."""
    from serverless_etl_bi_on_aws_spark.plans.queries import QUERIES

    df = QUERIES["q81_curation_funnel"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEval", "BatchEval", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"unexpected Python stage: {marker}"
    assert "ReadSchema: struct<source:string>" in plan  # n_raw scan pruned


def test_q82_plan_is_jvm_only(spark):
    """Both strategy twins inside q82 must stay JVM-side: the minhash
    rung is codegen'd min() aggregates + band-bucket joins (q13's pinned
    discipline), never a Python stage."""
    from serverless_etl_bi_on_aws_spark.plans.queries import QUERIES

    df = QUERIES["q82_minhash_curation_verify"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEval", "BatchEval", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"unexpected Python stage: {marker}"


def test_semantic_stage_composes_after_lexical(spark):
    """Fourth rung: paraphrase docs (lexically distinct, semantically
    near-identical embeddings) survive the lexical funnel but collapse
    in the semantic stage; docs without an embedding pass through; a
    lexically-dropped doc's embedding must NOT shield its semantic twin."""
    from serverless_etl_bi_on_aws_spark.operators.curation import (
        semantic_curation_stage,
    )

    para = (
        "seventeen astronomers catalogue distant variable stars with "
        "automated telescopes through extended winter observation "
        "campaigns spanning the high deserts of northern chile"
    )
    rows = [
        (1, "s1", GOOD),
        (2, "s1", GOOD),   # exact dup of 1 -> dropped lexically
        (3, "s1", para),   # paraphrase of 1: survives lexical, semantic twin
        (4, "s2", GOOD2),  # unrelated; has NO embedding
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    # embeddings: 1 and 3 near-identical; 2 identical to 1 (but 2 is
    # lexically dropped, so its embedding must not matter); 4 absent
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [1.0, 0.02, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    _, _, final = curation_stages(docs)
    assert {r.doc_id for r in final.select("doc_id").collect()} == {1, 3, 4}
    # n_clusters=1: with only the two twin embeddings surviving the
    # left-semi, k=2 would be forced to split them into separate
    # clusters (two points, two centroids) and never examine the pair —
    # the k<<n deployment rule in miniature
    curated = semantic_curation_stage(final, emb, threshold=0.9, n_clusters=1)
    assert {r.doc_id for r in curated.select("doc_id").collect()} == {1, 4}


def test_drop_frequent_paragraphs_semantics(spark):
    """Corpus-frequency boilerplate (round 14): paragraphs in >= min_df
    DISTINCT docs drop everywhere; survivors keep their original order;
    a repeated paragraph WITHIN one doc counts that doc once (and both
    copies drop/survive together); an all-boilerplate doc survives with
    empty text and its counts."""
    from serverless_etl_bi_on_aws_spark.operators.curation import (
        drop_frequent_paragraphs,
    )

    banner = "follow us on social media"
    rows = [
        (1, f"{banner}\nalpha one\n{banner}\nbeta two"),
        (2, f"{banner}\ngamma three"),
        (3, f"delta four\n{banner}"),
        (4, banner),  # all boilerplate
        (5, "epsilon five\nepsilon five"),  # self-duplicate, df=1 -> kept
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in drop_frequent_paragraphs(docs, min_df=3).collect()
    }
    assert out[1]["text"] == "alpha one\nbeta two"
    assert (out[1]["paras_kept"], out[1]["paras_dropped"]) == (2, 2)
    assert out[2]["text"] == "gamma three"
    assert out[3]["text"] == "delta four"
    assert out[4]["text"] == "" and out[4]["paras_dropped"] == 1
    assert out[5]["text"] == "epsilon five\nepsilon five"
    # min_df boundary: at 4 the banner (df=4) still drops; at 5 it stays
    out5 = {
        r["doc_id"]: r["text"]
        for r in drop_frequent_paragraphs(docs, min_df=5).collect()
    }
    assert out5[4] == banner


def test_decontaminate_contract(spark):
    """q96's operator at row level: any-overlap mode drops on one shared
    distinct 3-gram; rate mode keeps a doc sitting exactly ON the
    threshold (exact integer rule, no float product); short docs (< n
    tokens) always survive; the benchmark itself is never consulted for
    its own survival."""
    from serverless_etl_bi_on_aws_spark.operators.curation import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            # 10 distinct grams, exactly 1 contaminated ("the quick brown")
            (1, "the quick brown a b c d e f g h i"),
            # clean: no shared 3-gram
            (2, "entirely different words here now ok"),
            # short: 2 tokens -> no 3-gram -> survives even in strict mode
            (3, "the quick"),
            # fully contaminated
            (4, "quick brown fox jumps"),
        ],
        "doc_id long, text string",
    )

    strict = sorted(
        r.doc_id for r in decontaminate(docs, bench, max_overlap=0.0).collect()
    )
    assert strict == [2, 3]  # any hit drops 1 and 4; short doc 3 survives

    # doc 1: 10 grams, 1 hit -> rate exactly 0.1; the rule is
    # 10000*hits > 1000*grams i.e. 10000 > 10000 -> FALSE -> kept
    at_thresh = sorted(
        r.doc_id for r in decontaminate(docs, bench, max_overlap=0.1).collect()
    )
    assert at_thresh == [1, 2, 3]

    # just below the boundary the same doc drops
    below = sorted(
        r.doc_id for r in decontaminate(docs, bench, max_overlap=0.0999).collect()
    )
    assert below == [2, 3]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_overlap"):
        decontaminate(docs, bench, max_overlap=1.0)


def test_gopher_rung_catches_shape_violations(spark):
    """gopher=True drops a doc whose SHAPE violates the rules (ellipsis-
    heavy lines) even though the token-statistics score gate passes it;
    gopher=False keeps it; clean docs survive both paths with identical
    downstream results."""
    from serverless_etl_bi_on_aws_spark.functions.text import quality_score
    from serverless_etl_bi_on_aws_spark.operators.curation import curation_stages

    # both docs: diverse vocab (score gate passes), DISJOINT vocab
    # (no near-dup pair between them); doc 2 adds 9 ellipsis lines of
    # 10 total, which only the shape rules see
    clean = "the and " + " ".join(f"word{i:02d}" for i in range(58))
    ellipsisy = (
        "the and " + " ".join(f"item{i:02d}" for i in range(50))
        + "\n" + "\n".join(f"tail{i:02d} trails off..." for i in range(9))
    )
    rows = [(1, clean), (2, ellipsisy), (3, "x y")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # precondition: the score gate alone passes the ellipsis-heavy doc
    thr = 0.49999
    passed_score = {
        r["doc_id"]
        for r in df.filter(quality_score("text") >= thr).collect()
    }
    assert 2 in passed_score and 3 not in passed_score
    _, _, final_plain = curation_stages(df, quality_threshold=thr)
    _, _, final_gopher = curation_stages(df, quality_threshold=thr, gopher=True)
    assert {r["doc_id"] for r in final_plain.collect()} == {1, 2}
    assert {r["doc_id"] for r in final_gopher.collect()} == {1}


def test_dsir_rung_drops_off_target_docs(spark):
    """dsir_weights= (round 15) adds the target-distribution rung after
    the quality/gopher gates: a document that PASSES every in-isolation
    rule but belongs to the wrong distribution drops; the rung is off
    by default."""
    from serverless_etl_bi_on_aws_spark.operators.curation import curation_stages
    from serverless_etl_bi_on_aws_spark.operators.selection import (
        fit_dsir_weights,
    )

    svoc = ["physics", "quantum", "theorem", "energy", "research", "study"]
    cvoc = ["cheap", "click", "sale", "deal", "offer", "price"]

    def doc(voc, i):
        return " ".join(voc[(i + j) % 6] + f"{i}x{j}" for j in range(40))

    rows = [(i, doc(svoc, i)) for i in range(0, 20)] + [
        (i, doc(cvoc, i)) for i in range(20, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    target = df.filter("doc_id < 20")
    w = fit_dsir_weights(target, df, num_buckets=1 << 12).cache()
    # both populations pass the plain funnel's quality gate
    _, _, plain = curation_stages(df, jaccard_threshold=1.1)
    assert {r.doc_id for r in plain.collect()} == set(range(40))
    _, _, selected = curation_stages(
        df, jaccard_threshold=1.1, dsir_weights=w, dsir_min_milli=0
    )
    assert {r.doc_id for r in selected.collect()} == set(range(20))
    w.unpersist()


def test_curation_blocklist_rung(spark):
    """Round 17: the phrase-blocklist rung drops exactly the documents
    containing a blocked phrase (multi-word, overlapping-tokenizer
    semantics from q127's gazetteer), runs before dedup (a blocked
    doc's near-dup twin survives if itself clean), and the knob's
    absence leaves the funnel unchanged."""
    from pyspark.sql import functions as F

    from serverless_etl_bi_on_aws_spark.operators.curation import (
        curation_stages,
    )

    base = " ".join(f"alpha{i:02d} beta{i:02d}" for i in range(30))
    rows = [
        (1, base),
        (2, base.replace("alpha03", "forbidden phrase here or")),  # blocked
        (3, " ".join(f"clean{i:02d} word{i:02d}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    terms = spark.createDataFrame([("forbidden phrase",)], "term string")

    _q, _u, final_plain = curation_stages(docs, jaccard_threshold=0.5)
    plain_ids = {r.doc_id for r in final_plain.select("doc_id").collect()}

    _q2, _u2, final_blk = curation_stages(
        docs, jaccard_threshold=0.5, blocklist_terms=terms
    )
    blk_ids = {r.doc_id for r in final_blk.select("doc_id").collect()}
    assert 2 not in blk_ids  # blocked phrase dropped it
    assert blk_ids == {1, 3}  # clean docs survive every rung
    assert blk_ids == plain_ids - {2}  # the ONLY difference is the rung
