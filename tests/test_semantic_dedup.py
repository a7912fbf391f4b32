"""Semantic (cluster-pruned) embedding dedup — operators/semantic_dedup.py.

Pins the three contracts q80 exports to the driver, plus the pieces the
driver can't see: sub-tiling of oversized clusters, planted
near-identical duplicates co-clustering, and reuse of an external
assignment (the IVF-index path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.semantic_dedup import (
    cluster_assignments,
    semantic_dedup,
    semantic_neardup_pairs,
)
from serverless_etl_bi_on_aws_spark.operators.similarity import (
    neardup_cosine_pairs,
)

from conftest import SF_CORRECT


def _planted(spark, n_groups: int = 6, dim: int = 8):
    """n_groups well-separated direction groups; each group holds one base
    vector (id g), one NEAR-IDENTICAL copy (id g+1000, tiny orthogonal
    nudge -> cosine ~0.999), and one decoy at ~45 degrees that stays below
    the 0.9 threshold (id g+2000)."""
    rows = []
    for g in range(n_groups):
        base = [0.0] * dim
        base[g % dim] = 1.0
        near = list(base)
        near[(g + 1) % dim] += 0.02
        decoy = list(base)
        decoy[(g + 1) % dim] += 1.0  # 45 degrees: cosine ~0.707
        rows.append((g, [float(x) for x in base]))
        rows.append((g + 1000, [float(x) for x in near]))
        rows.append((g + 2000, [float(x) for x in decoy]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_planted_near_identical_pairs_all_captured(spark):
    """Near-identical duplicates co-cluster (the SemDeDup premise): at a
    high threshold every planted (g, g+1000) pair is found and exactly
    the copies are dropped."""
    emb = _planted(spark)
    pairs = semantic_neardup_pairs(emb, threshold=0.9, n_clusters=6, seed=7)
    got = {(r.id_1, r.id_2) for r in pairs.collect()}
    assert got == {(g, g + 1000) for g in range(6)}
    surv = semantic_dedup(emb, threshold=0.9, n_clusters=6, seed=7)
    kept = {r.vec_id for r in surv.select("vec_id").collect()}
    assert kept == {g for g in range(6)} | {g + 2000 for g in range(6)}


def test_clustered_pairs_subset_of_exact_and_partition(spark):
    """The q80 invariants on the real fixture: clustered pairs are a
    subset of the exact blocked-matmul pair set, and survivors + dropped
    repartition the corpus exactly."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    exact = neardup_cosine_pairs(emb, 0.4)
    clustered = semantic_neardup_pairs(emb, 0.4, n_clusters=4, seed=42)
    extra = clustered.join(
        exact.select("id_1", "id_2"), ["id_1", "id_2"], "left_anti"
    ).count()
    assert extra == 0
    n = emb.count()
    dropped = clustered.select("id_2").distinct().count()
    survivors = semantic_dedup(emb, 0.4, n_clusters=4, seed=42).count()
    assert survivors + dropped == n
    assert dropped > 0  # the fixture's >=0.4 pairs do land in clusters


def test_subtiling_matches_single_tile(spark):
    """A cluster larger than block_rows sub-tiles into multiple matmul
    groups; the pair set must be identical to the one-tile run (same
    assignment, different tiling)."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    asg = cluster_assignments(emb, n_clusters=2, seed=42)
    one = semantic_neardup_pairs(
        emb, 0.4, assignments=asg, block_rows=4096
    )
    tiled = semantic_neardup_pairs(emb, 0.4, assignments=asg, block_rows=37)
    sym_diff = one.join(tiled, ["id_1", "id_2"], "full_outer").filter(
        one["cosine"].isNull() | tiled["cosine"].isNull()
    )
    assert sym_diff.count() == 0


def test_external_assignment_reused_no_kmeans_fit(spark, monkeypatch):
    """Passing assignments= must not re-fit KMeans (the IVF-index reuse
    path): trap the fit the way test_asof_ivf pins the probe."""
    from pyspark.ml.clustering import KMeans

    emb = load_table(spark, SF_CORRECT, "embeddings")
    asg = cluster_assignments(emb, n_clusters=4, seed=42).localCheckpoint(
        eager=True
    )

    def boom(self, *a, **k):  # pragma: no cover - trap
        raise AssertionError("KMeans.fit called despite external assignments")

    monkeypatch.setattr(KMeans, "fit", boom)
    pairs = semantic_neardup_pairs(emb, 0.4, assignments=asg)
    assert pairs.count() > 0


@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_sample_fit_assignment_keeps_contracts(spark, monkeypatch):
    """fit_sample_rows on the semantic path (round-10 verdict #2): the
    fit is bounded (trap-pinned), every embedding still gets an
    assignment through the BLAS argmin stage, and the q80 soundness
    contracts — clustered pairs ⊆ exact pairs, survivors + dropped ==
    corpus — hold for the sample-placed centroids (they hold for ANY
    assignment; sampling only moves capture)."""
    from pyspark.ml.clustering import KMeans

    emb = load_table(spark, SF_CORRECT, "embeddings")
    bound = 100
    real_fit = KMeans.fit

    def bounded_fit(self, dataset, *a, **kw):
        assert dataset.count() <= bound, "KMeans.fit saw more than the sample"
        return real_fit(self, dataset, *a, **kw)

    monkeypatch.setattr(KMeans, "fit", bounded_fit)
    asg = cluster_assignments(emb, n_clusters=4, seed=42, fit_sample_rows=bound)
    assert asg.count() == emb.count()
    assert asg.select("_cluster").distinct().count() <= 4

    clustered = semantic_neardup_pairs(
        emb, 0.4, n_clusters=4, seed=42, fit_sample_rows=bound
    )
    exact = neardup_cosine_pairs(emb, 0.4)
    extra = clustered.join(
        exact.select("id_1", "id_2"), ["id_1", "id_2"], "left_anti"
    ).count()
    assert extra == 0
    dropped = clustered.select("id_2").distinct().count()
    survivors = semantic_dedup(
        emb, 0.4, n_clusters=4, seed=42, fit_sample_rows=bound
    ).count()
    assert survivors + dropped == emb.count()
    # planted near-identical copies are still caught under a sampled fit
    planted = _planted(spark)
    surv = semantic_dedup(
        planted, threshold=0.9, n_clusters=6, seed=7, fit_sample_rows=10
    )
    kept = {r.vec_id for r in surv.select("vec_id").collect()}
    assert not any(g + 1000 in kept and g in kept for g in range(6))


def test_empty_corpus(spark):
    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    asg = spark.createDataFrame([], "vec_id bigint, _cluster int")
    assert semantic_neardup_pairs(emb, 0.4, assignments=asg).count() == 0
    assert semantic_dedup(emb, 0.4, assignments=asg).count() == 0


@pytest.mark.parametrize("threshold", [0.9])
@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_zero_norm_rows_never_pair(spark, threshold):
    """Zero-norm vectors clamp to cosine 0 in the shared kernel — they
    must survive dedup and never appear in a pair."""
    emb = _planted(spark).union(
        _planted(spark)
        .sparkSession.createDataFrame(
            [(9000, [0.0] * 8), (9001, [0.0] * 8)],
            "vec_id bigint, embedding array<float>",
        )
    )
    pairs = semantic_neardup_pairs(emb, threshold, n_clusters=4, seed=7)
    ids_in_pairs = {
        r[0]
        for r in pairs.select(F.explode(F.array("id_1", "id_2"))).collect()
    }
    assert 9000 not in ids_in_pairs and 9001 not in ids_in_pairs
    kept = {
        r.vec_id
        for r in semantic_dedup(emb, threshold, n_clusters=4, seed=7)
        .select("vec_id")
        .collect()
    }
    assert {9000, 9001} <= kept
