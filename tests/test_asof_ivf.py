"""As-of join vs pandas merge_asof ground truth; IVF-ANN scan reduction and
agreement with brute force."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.asof import asof_join
from serverless_etl_bi_on_aws_spark.operators.similarity import (
    topk_cosine_bruteforce,
    topk_cosine_ivf,
)

from tests.conftest import SF_CORRECT, SF_SMOKE


def _views_and_purchases(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    return views, buys


def test_asof_join_matches_pandas(spark):
    views, buys = _views_and_purchases(spark)
    out = asof_join(views, buys, key="user_id", left_ts="ts", right_ts="ts",
                    value_cols=["value"]).toPandas()
    lpd = views.toPandas().sort_values("ts")
    rpd = buys.toPandas().sort_values("ts")
    expected = pd.merge_asof(lpd, rpd, on="ts", by="user_id", direction="backward")
    merged = out.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    expected = expected.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    assert len(merged) == len(expected)
    a, b = merged["asof_value"].fillna(-1).tolist(), expected["value"].fillna(-1).tolist()
    assert a == b


def test_asof_join_strict_excludes_exact(spark):
    views, buys = _views_and_purchases(spark)
    # right side = the views themselves: with exact matches allowed every row
    # matches itself; strict mode must not self-match
    self_right = views.select("user_id", "ts", F.col("event_id").alias("src_event"))
    exact = asof_join(views, self_right, "user_id", "ts", "ts", ["src_event"])
    strict = asof_join(views, self_right, "user_id", "ts", "ts", ["src_event"],
                       allow_exact_matches=False)
    n_self = exact.filter(F.col("asof_src_event") == F.col("event_id")).count()
    assert n_self == views.count()
    n_self_strict = strict.filter(F.col("asof_src_event") == F.col("event_id")).count()
    assert n_self_strict == 0


def test_ivf_topk_agrees_with_bruteforce_scores(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    pool = emb.filter(F.col("vec_id") != 0)
    exact = {r.vec_id: r.cosine for r in topk_cosine_bruteforce(pool, qvec, k=100).collect()}
    approx = topk_cosine_ivf(pool, qvec, k=10, n_clusters=8, n_probe=3).collect()
    assert 0 < len(approx) <= 10
    for r in approx:
        if r.vec_id in exact:
            assert abs(r.cosine - exact[r.vec_id]) < 1e-9
    hits = sum(1 for r in approx if r.vec_id in exact)
    assert hits >= 3, f"IVF recall vs exact top-100 too low: {hits}/10"


def test_persisted_ivf_probe_no_refit(spark, tmp_path, monkeypatch):
    """build_ivf_index / ivf_probe_topk (round-7 verdict #7): after the
    one-time build, probes run ZERO KMeans fits (the build/probe split a
    repeated-query workload needs), results agree with brute force on
    overlapping ids, the probed partition subset actually prunes the scan,
    and two probes return identical rows."""
    from serverless_etl_bi_on_aws_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_topk,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    pool = emb.filter(F.col("vec_id") != 0)
    idx = str(tmp_path / "ivf_index")
    build_ivf_index(pool, idx, n_clusters=8, seed=42)

    # any further KMeans fit would raise
    from pyspark.ml.clustering import KMeans

    def boom(self, *a, **k):  # pragma: no cover - the point is it never runs
        raise AssertionError("KMeans.fit called during probe")

    monkeypatch.setattr(KMeans, "fit", boom)

    got1 = ivf_probe_topk(spark, idx, qvec, k=10, n_probe=3).collect()
    got2 = ivf_probe_topk(spark, idx, qvec, k=10, n_probe=3).collect()
    assert [tuple(r) for r in got1] == [tuple(r) for r in got2]
    assert 0 < len(got1) <= 10

    exact = {r.vec_id: r.cosine for r in topk_cosine_bruteforce(pool, qvec, k=100).collect()}
    hits = 0
    for r in got1:
        if r.vec_id in exact:
            hits += 1
            assert abs(r.cosine - exact[r.vec_id]) < 1e-9
    assert hits >= 3, f"persisted-IVF recall vs exact top-100 too low: {hits}/10"

    # the probe is partition pruning: the cluster filter reaches the scan
    # and the candidate set is a strict subset of the corpus
    probed = ivf_probe_topk(spark, idx, qvec, k=10, n_probe=3)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "_cluster" in plan  # partition filter present in the scan
    cand = ivf_probe_topk(spark, idx, qvec, k=10**9, n_probe=3).count()
    assert 0 < cand < spark.read.parquet(f"{idx}/corpus").count()
