"""LM-scoring tests: hand-computed smoothed probabilities on a toy
corpus, reference-vs-gibberish separation, and the threshold gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.operators.lm_score import (
    filter_by_lm_score,
    score_documents,
    train_bigram_lm,
)


def test_bigram_lm_hand_computed(spark):
    """Reference 'a b a b a'. Unigrams: a=3, b=2 (V=2). Bigrams:
    'a b'=2, 'b a'=2. Score doc 'a b a': bigrams ['a b', 'b a'],
    p(a b) = (2+1)/(3+2) = 3/5; p(b a) = (2+1)/(2+2) = 3/4."""
    ref = spark.createDataFrame([("a b a b a",)], ["text"])
    b, u, v = train_bigram_lm(ref)
    assert v == 2
    assert {r["bigram"]: r["c2"] for r in b.collect()} == {"a b": 2, "b a": 2}
    assert {r["w"]: r["c1"] for r in u.collect()} == {"a": 3, "b": 2}
    doc = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    row = score_documents(doc, b, u, v).head()
    want = (math.log(3 / 5) + math.log(3 / 4)) / 2
    assert row["n_bigrams"] == 2 and row["n_unseen"] == 0
    assert abs(row["avg_logprob"] - want) < 1e-12
    # unseen bigram: 'b b' has c2=0, c1(b)=2 -> p = 1/(2+2)
    doc2 = spark.createDataFrame([(2, "b b")], ["doc_id", "text"])
    row2 = score_documents(doc2, b, u, v).head()
    assert row2["n_unseen"] == 1
    assert abs(row2["avg_logprob"] - math.log(1 / 4)) < 1e-12


def test_lm_separates_reference_like_from_gibberish(spark):
    ref = spark.createDataFrame(
        [("the cat sat on the mat " * 20,), ("the dog sat on the rug " * 20,)],
        ["text"],
    )
    b, u, v = train_bigram_lm(ref)
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the rug"),          # reference-like
            (2, "zq xv wk pq mn zz ab qq"),          # gibberish (all OOV)
        ],
        ["doc_id", "text"],
    )
    scores = {r["doc_id"]: r["avg_logprob"] for r in score_documents(docs, b, u, v).collect()}
    assert scores[1] > scores[2] + 1.0  # clearly separated in ln-space
    kept = filter_by_lm_score(
        docs, b, u, v, threshold=(scores[1] + scores[2]) / 2
    ).collect()
    assert [r["doc_id"] for r in kept] == [1]


def test_unscored_policy_for_sub_bigram_docs(spark):
    """Docs with <2 tokens have no bigrams and no score; the gate's
    treatment of them is an explicit policy, not a silent delete:
    'drop' removes them (default, CCNet-style), 'keep' passes them
    through un-gated."""
    import pytest

    ref = spark.createDataFrame([("a b a b a",)], ["text"])
    b, u, v = train_bigram_lm(ref)
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a"), (3, "")], ["doc_id", "text"]
    )
    # permissive threshold: every SCORED doc passes
    kept_drop = {r["doc_id"] for r in
                 filter_by_lm_score(docs, b, u, v, threshold=-100.0).collect()}
    assert kept_drop == {1}
    kept_keep = {r["doc_id"] for r in
                 filter_by_lm_score(docs, b, u, v, threshold=-100.0,
                                    unscored="keep").collect()}
    assert kept_keep == {1, 2, 3}
    # harsh threshold: scored docs fail, unscored still pass with 'keep'
    kept_harsh = {r["doc_id"] for r in
                  filter_by_lm_score(docs, b, u, v, threshold=100.0,
                                     unscored="keep").collect()}
    assert kept_harsh == {2, 3}
    with pytest.raises(ValueError):
        filter_by_lm_score(docs, b, u, v, threshold=0.0, unscored="maybe")
