"""Model-based quality filter tests: a planted separable corpus (fixture
text as keep-worthy vs degenerate junk as low-quality), held-out
accuracy, threshold behavior, and the map-only scoring contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.quality_model import (
    filter_by_quality,
    score_quality,
    train_quality_classifier,
)
from tests.conftest import SF_CORRECT


def _planted(spark):
    """200 fixture docs labeled 1.0 vs 200 synthetic junk docs labeled
    0.0 (token salad drawn from a disjoint junk vocabulary, repeated
    tokens — the degenerate text a quality gate must reject)."""
    good = (
        load_table(spark, SF_CORRECT, "documents")
        .limit(200)
        .select("doc_id", "text", F.lit(1.0).alias("label"))
    )
    junk_rows = [
        (
            10_000 + i,
            " ".join(
                ["spamtok%d" % (j % 3) for j in range(i % 17 + 5)]
                + ["zzz"] * (i % 7 + 3)
            ),
            0.0,
        )
        for i in range(200)
    ]
    junk = spark.createDataFrame(junk_rows, ["doc_id", "text", "label"])
    return good.unionByName(junk)


def test_quality_classifier_separates_planted_corpus(spark):
    data = _planted(spark)
    train = data.filter(F.col("doc_id") % 4 != 0)
    test = data.filter(F.col("doc_id") % 4 == 0)
    model = train_quality_classifier(train)
    scored = score_quality(test, model)
    agg = scored.select(
        (
            ((F.col("quality_prob") >= 0.5) == (F.col("label") == 1.0)).cast("int")
        ).alias("ok")
    ).agg(F.avg("ok").alias("acc"))
    acc = agg.head()["acc"]
    assert acc >= 0.95, acc  # fully separable vocabularies


def test_filter_by_quality_threshold_monotone(spark):
    data = _planted(spark)
    model = train_quality_classifier(data)
    n_all = data.count()
    kept_50 = filter_by_quality(data, model, threshold=0.5).count()
    kept_90 = filter_by_quality(data, model, threshold=0.9).count()
    assert 0 < kept_90 <= kept_50 < n_all


def test_quality_scoring_is_map_only(spark):
    """Scoring 100 TB must be a scan: no Exchange in the executed plan,
    and the output keeps the input columns + the probability."""
    model = train_quality_classifier(_planted(spark))
    corpus = load_table(spark, SF_CORRECT, "documents").select("doc_id", "text")
    scored = score_quality(corpus, model)
    assert set(scored.columns) == {"doc_id", "text", "quality_prob"}
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
