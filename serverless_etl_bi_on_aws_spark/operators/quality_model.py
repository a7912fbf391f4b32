"""Model-based quality filtering — the classifier gate modern LLM data
pipelines run after rule-based hygiene (CCNet's fasttext LM filter,
FineWeb/DCLM's quality classifiers): train a linear model on a small
labeled sample, score the whole corpus, keep what clears a threshold.

The rule-based signals already in the engine (q15 quality_score, q55
repetition stats, q20 language-ID) are hand-set heuristics; this operator
learns the decision boundary from labels instead. Architecture is the
standard sparse linear recipe — hashed bag-of-tokens (feature hashing,
Weinberger et al. ICML 2009) into logistic regression — expressed with
Spark ML primitives (JVM-side, no Python in either phase):

  * :func:`train_quality_classifier` — fit on a LABELED SAMPLE. Labels
    are the caller's (human ratings, an LM-perplexity proxy, "wiki vs
    crawl" source labels à la GPT-2's WebText filter). At 100 TB the
    labeled set is ~1e5-1e6 rows — training cost is independent of corpus
    size.
  * :func:`score_quality` — ``model.transform``: tokenize → HashingTF →
    logistic. Map-only (the weight vector broadcasts inside the model);
    scoring 100 TB is a scan, no shuffle — pinned by the no-Exchange plan
    test.
  * :func:`filter_by_quality` — threshold on the positive-class
    probability; the knob every pipeline sweeps (keep-rate vs precision).

Determinism: HashingTF is a pure hash; LBFGS on a fixed dataset converges
to the same optimum (convex loss) — scores are reproducible to float
noise, which is why the tests assert separation margins, not exact
probabilities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 16,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Fit the hashed-BoW logistic quality model on a labeled sample;
    returns a fitted ``PipelineModel`` whose ``transform`` is map-only.

    ``label_col``: 1.0 = keep-worthy, 0.0 = junk. ``num_features`` is the
    hash width — 2^16 keeps the weight vector at 256 KB (broadcast-cheap)
    with collision rates fine for quality signals; raise to 2^20 for a
    real web corpus."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__words", pattern=" ", gaps=True
    )
    tf = HashingTF(
        inputCol="__words", outputCol="__features", numFeatures=num_features
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append ``out_col``: P(keep) under the trained model. Map-only —
    the plan must show no Exchange (pytest-pinned)."""
    scored = model.transform(df)
    # probability is a 2-vector [P(0), P(1)]; export the scalar
    from pyspark.ml.functions import vector_to_array

    return scored.withColumn(
        out_col, vector_to_array("probability").getItem(1)
    ).drop("__words", "__features", "rawPrediction", "probability", "prediction")


def filter_by_quality(
    df: DataFrame,
    model,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep rows whose P(keep) clears ``threshold`` — the pipeline's
    keep-rate/precision knob."""
    return (
        score_quality(df, model, text_col)
        .filter(F.col("quality_prob") >= threshold)
    )
