"""Language-ID (operators/lang_id.py, round 14): bounded-fit trap,
map-only scoring plan, held-out separation on the planted corpus, and
the derived-language twin (a q41/q56-class per-language grouping run off
DERIVED lang on a lang-stripped copy must match the trusted column)."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.lang_id import (
    PLANTED_SENTENCES,
    derive_language,
    planted_multilingual_text,
    score_language,
    train_lang_classifier,
)
from tests.conftest import SF_CORRECT


def _planted(spark, n_docs=400):
    return (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", "lang")
        .filter(
            (F.col("doc_id") < n_docs)
            & F.col("lang").isin(sorted(PLANTED_SENTENCES))
        )
        .withColumn("text", planted_multilingual_text())
    )


def test_bounded_fit_never_trains_on_the_corpus(spark, monkeypatch):
    """The 100 TB contract: whatever the corpus size, the pipeline fit
    sees at most fit_sample_rows rows — trapped at Pipeline.fit."""
    from pyspark.ml import Pipeline

    seen = {}
    orig = Pipeline.fit

    def trap(self, dataset, *a, **kw):
        seen["rows"] = dataset.count()
        return orig(self, dataset, *a, **kw)

    monkeypatch.setattr(Pipeline, "fit", trap)
    docs = _planted(spark)
    model = train_lang_classifier(
        docs, fit_sample_rows=40, num_features=1 << 12, max_iter=10
    )
    assert seen["rows"] <= 40, seen
    assert len(model.lang_labels) >= 2


def test_scoring_is_map_only_and_held_out_accurate(spark):
    docs = _planted(spark)
    train = docs.filter(F.col("doc_id") % 4 != 0)
    eval_df = docs.filter(F.col("doc_id") % 4 == 0)
    model = train_lang_classifier(train, num_features=1 << 14, max_iter=25)
    # alphabetical label map is part of the determinism contract
    assert list(model.lang_labels) == sorted(PLANTED_SENTENCES)
    pred = score_language(eval_df, model)
    plan = pred._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert set(pred.columns) == {"doc_id", "lang", "text", "pred_lang"}
    agg = pred.agg(
        F.count("*").alias("n"),
        F.sum((F.col("pred_lang") == F.col("lang")).cast("long")).alias("ok"),
    ).head()
    assert agg["n"] > 0 and agg["ok"] == agg["n"], (
        f"held-out accuracy {agg['ok']}/{agg['n']} on a margin-separated corpus"
    )


def test_derived_language_twin_matches_trusted_column(spark):
    """q41/q56-class per-language grouping off DERIVED lang: strip the
    trusted column, re-derive it with the model, and the per-language
    doc counts must be identical to grouping by the fixture labels."""
    docs = _planted(spark)
    model = train_lang_classifier(
        docs.filter(F.col("doc_id") % 4 != 0), num_features=1 << 14, max_iter=25
    )
    truth = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    stripped = docs.drop("lang")
    derived = derive_language(stripped, model)
    got = {
        r["lang"]: r["n"]
        for r in derived.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == truth


def test_script_router_handles_unseen_scripts_and_stays_map_only(spark):
    """identify_language (round 15): a script-unique language the
    classifier NEVER saw must resolve at the codepoint layer — cyrillic
    routes ru, hangul routes ko, arabic routes ar — while latin text
    still goes through the classifier; and the composed plan stays
    Exchange-free (one scan, router is a when() over the same row)."""
    from serverless_etl_bi_on_aws_spark.operators.lang_id import (
        identify_language,
    )

    docs = _planted(spark)
    model = train_lang_classifier(
        docs, fit_sample_rows=2000, num_features=1 << 13, max_iter=15
    )
    probe = spark.createDataFrame(
        [
            (0, "мир труд май и хорошие слова", "ru"),      # never trained
            (1, "한국어 텍스트 문서입니다", "ko"),             # never trained
            (2, "سلام این متن عربی است", "ar"),             # never trained
            (3, "the quick value of the table is good", "en"),  # classifier
            (4, "数据表的值很好并且结果去商店", "zh"),          # router, not clf
        ],
        "doc_id bigint, text string, expected string",
    )
    out = identify_language(probe, model)
    got = {r.doc_id: r.pred_lang for r in out.collect()}
    assert got == {0: "ru", 1: "ko", 2: "ar", 3: "en", 4: "zh"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_short_strings_not_length_biased(spark):
    """Round-15 regression (fails with fitIntercept=True): raw-count
    features + intercepts make 'few active features' itself a class
    signal, so a model fit on short zh sentences scored EVERY 18-char
    latin prefix as zh (measured p~0.86). Without intercepts the
    decision is feature-driven and short prefixes keep their language."""
    from serverless_etl_bi_on_aws_spark.operators.lang_id import (
        identify_language,
    )

    docs = _planted(spark)
    train = docs.filter(F.col("doc_id") % 4 != 0)
    eval_df = docs.filter(F.col("doc_id") % 4 == 0)
    model = train_lang_classifier(
        train, fit_sample_rows=10_000, num_features=1 << 14, max_iter=25
    )
    short = eval_df.select(
        "lang", F.substring("text", 1, 18).alias("text")
    )
    scored = identify_language(short, model)
    agg = scored.agg(
        F.count("*").alias("n"),
        F.sum((F.col("pred_lang") == F.col("lang")).cast("long")).alias("ok"),
    ).first()
    assert agg.ok >= 0.9 * agg.n, (agg.ok, agg.n)
