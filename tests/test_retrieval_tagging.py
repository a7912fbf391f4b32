"""Round-17 operators: late-interaction MaxSim retrieval
(operators/late_interaction.py) and gazetteer phrase tagging
(operators/gazetteer.py) — exact-value unit tests plus plan pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.operators.gazetteer import gazetteer_tag
from serverless_etl_bi_on_aws_spark.operators.late_interaction import (
    maxsim_scores,
    maxsim_topk,
)


def test_maxsim_exact_small_case(spark):
    """Hand-computable MaxSim over axis-aligned vectors: cosines are
    0/1 exactly, so score_micro is exact integer arithmetic with no
    rounding sensitivity. Also pins determinism under repartitioning
    and the tie-break on id."""
    rows = [
        # doc 1: holds e0 and e1 -> max cos vs e0 = 1, vs e1 = 1 -> 2e6
        (1, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        # doc 2: holds e0 twice -> max vs e0 = 1, vs e1 = 0 -> 1e6
        (2, [1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0]),
        # doc 3: orthogonal to both queries -> 0
        (3, [0.0, 0.0, 5.0]),
        # doc 4: same profile as doc 2 -> ties; id breaks
        (4, [3.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, vec array<double>")
    q = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    got = [(r.doc_id, r.score_micro) for r in maxsim_topk(df, q, k=3).collect()]
    assert got == [(1, 2_000_000), (2, 1_000_000), (4, 1_000_000)]
    again = [
        (r.doc_id, r.score_micro)
        for r in maxsim_topk(df.repartition(7), q, k=3).collect()
    ]
    assert again == got
    with pytest.raises(ValueError, match="k must"):
        maxsim_topk(df, q, k=0)
    with pytest.raises(ValueError, match="non-empty"):
        maxsim_scores(df, [])


def test_maxsim_plan_one_exchange_no_python(spark):
    """Scale-shape pin: the MaxSim top-k plans ONE doc-keyed exchange
    (partial max aggregates collapse tokens map-side), a TakeOrdered
    top-k (never a global sort), and zero Python stages."""
    rows = [(i % 10, [float(i), 1.0, 0.5]) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, vec array<double>")
    top = maxsim_topk(df, [[1.0, 0.0, 0.0]], k=3)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_max" in plan or "partial" in plan, plan
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan


def test_maxsim_pruned_matches_exact_on_fixture(spark, tmp_path):
    """The two-stage (IVF candidate generation -> exact MaxSim) scale
    path returns the exact top-5 on the fixture: with shortlist=100
    over 500 token vectors every strong token surfaces, so the pruned
    result must EQUAL the exact one (q18's recall-vs-exact discipline,
    here at equality because the shortlist covers the fixture); and the
    pruned scorer demonstrably scopes its input (candidate docs <=
    corpus docs)."""
    from pyspark.sql import functions as F2

    from serverless_etl_bi_on_aws_spark.catalog import load_table
    from serverless_etl_bi_on_aws_spark.operators.similarity import (
        build_ivf_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    doc_tokens = emb.select(
        F2.pmod(F2.col("vec_id"), F2.lit(50)).alias("doc_id"),
        F2.col("vec_id"),
        F2.col("embedding").alias("vec"),
    )
    qvecs = [
        [float(x) for x in r[0]]
        for r in emb.filter(F2.col("vec_id").isin([1, 2, 3]))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_clusters=8, seed=42)
    exact = [
        (r.doc_id, r.score_micro)
        for r in maxsim_topk(
            doc_tokens.drop("vec_id"), qvecs, k=5
        ).collect()
    ]
    from serverless_etl_bi_on_aws_spark.operators.late_interaction import (
        maxsim_topk_pruned,
    )

    pruned = [
        (r.doc_id, r.score_micro)
        for r in maxsim_topk_pruned(
            spark, doc_tokens, idx, qvecs, k=5, n_probe=8, shortlist=100
        ).collect()
    ]
    assert pruned == exact


def test_gazetteer_overlapping_counts_and_lengths(spark):
    """Exact occurrence semantics: overlapping matches count ('a a a'
    holds 'a a' twice), mixed phrase lengths explode separately, both a
    1-gram and a 3-gram hit in one doc, docs with no hits emit nothing,
    duplicate dictionary rows collapse, an empty dictionary returns an
    empty frame."""
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # 'a a' x2 (overlap), 'a' x3
            (2, "x y z x y z"),      # 'x y z' x2
            (3, "nothing here"),
        ],
        "doc_id bigint, text string",
    )
    terms = spark.createDataFrame(
        [("a a",), ("a",), ("x y z",), ("a a",), ("missing phrase",)],
        "term string",
    )
    got = {
        (r.doc_id, r.term): r.n_hits
        for r in gazetteer_tag(docs, terms).collect()
    }
    assert got == {
        (1, "a a"): 2,
        (1, "a"): 3,
        (2, "x y z"): 2,
    }
    empty = gazetteer_tag(docs, terms.limit(0))
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "term", "n_hits"]


def test_gazetteer_plan_broadcast_gated_no_cartesian(spark, monkeypatch):
    """Scale-shape pin: the dictionary join is an explicit broadcast
    under the merge-family size gate (holds with the auto threshold
    disabled), degrades to a shuffled join with IDENTICAL counts when
    the gate is forced shut, and never plans a cartesian product."""
    from serverless_etl_bi_on_aws_spark.operators import gazetteer as mod
    from serverless_etl_bi_on_aws_spark.operators import merge as merge_mod

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta tok{i}") for i in range(40)],
        "doc_id bigint, text string",
    )
    # a VALUES local relation (exact Catalyst size stats) — a Python
    # createDataFrame plans as ExistingRDD, whose UNKNOWN size the gate
    # rightly refuses to broadcast
    terms = spark.sql("SELECT * FROM VALUES ('alpha beta'), ('tok3') AS t(term)")

    def run():
        df = gazetteer_tag(docs, terms)
        rows = sorted(tuple(r) for r in df.collect())
        return rows, df._jdf.queryExecution().executedPlan().toString()

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        rows_hinted, plan_hinted = run()
        assert "BroadcastHashJoin" in plan_hinted, plan_hinted
        assert "CartesianProduct" not in plan_hinted
        monkeypatch.setattr(merge_mod, "BROADCAST_STAGING_MAX_BYTES", -1)
        rows_shuffled, plan_shuffled = run()
        assert "BroadcastHashJoin" not in plan_shuffled, plan_shuffled
        assert (
            "SortMergeJoin" in plan_shuffled
            or "ShuffledHashJoin" in plan_shuffled
        )
        assert rows_shuffled == rows_hinted
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert len(rows_hinted) == 41  # 'alpha beta' in all 40 docs + tok3


def test_maxsim_null_vector_rows_dropped_and_mismatch_raises(spark):
    """r17 ADVICE hardening: NULL token vectors are dropped before the
    aggregate (a doc of only NULL vectors vanishes instead of riding a
    NULL score into the ordering), and a dimension-mismatched vector
    fails loudly instead of scoring NULL."""
    import pytest

    from serverless_etl_bi_on_aws_spark.operators.late_interaction import (
        maxsim_scores,
    )

    q = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [1.0, 0.0]),
        (1, None),            # NULL vec among valid ones: ignored
        (2, None),            # doc of ONLY NULL vecs: no output row
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, vec array<double>")
    got = {r.doc_id: r.score_micro for r in maxsim_scores(df, q).collect()}
    assert set(got) == {1}
    assert got[1] == 1_000_000 + 0  # cos(q0,t)=1, cos(q1,t)=0

    bad = spark.createDataFrame(
        [(3, [1.0, 0.0, 0.0])], "doc_id bigint, vec array<double>"
    )
    with pytest.raises(Exception, match="malformed token vector"):
        maxsim_scores(bad, q).collect()


def test_gazetteer_empty_dictionary_preserves_id_dtype(spark):
    """r17 ADVICE hardening: the empty-dictionary early return builds its
    frame from the caller's ACTUAL id dtype, so a string-keyed corpus
    unions cleanly with the non-empty path's output."""
    from serverless_etl_bi_on_aws_spark.operators.gazetteer import gazetteer_tag

    docs = spark.createDataFrame(
        [("a", "some text")], "name string, text string"
    )
    empty_terms = spark.createDataFrame([], "term string")
    out = gazetteer_tag(docs, empty_terms, id_col="name")
    assert out.count() == 0
    assert dict(out.dtypes)["name"] == "string"
