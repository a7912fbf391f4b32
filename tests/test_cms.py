"""Count-Min sketch (operators/sketches.py round-14 half): the
never-undercount guarantee, exact-merge semantics, weighted builds,
cross-partitioning determinism, reference-exact estimates, and the
broadcast/bounded plan shapes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
    cms_positions,
)


def _zipfish(spark, n=2000):
    # key k appears with multiplicity ~ n/(k+1): heavy head, long tail
    return spark.range(n).select(
        F.concat(F.lit("key"), F.expr("id % 40")).alias("k")
    )


def _true_counts(df, key="k"):
    return {r[key]: r.cnt for r in df.groupBy(key).agg(F.count("*").alias("cnt")).collect()}


def test_estimates_never_undercount_and_bound(spark):
    df = _zipfish(spark)
    width, depth = 256, 5
    sketch = cms_build(df, "k", width=width, depth=depth)
    truth = _true_counts(df)
    keys = df.select("k").distinct()
    est = {r.k: r.est for r in cms_estimate(sketch, keys, "k").collect()}
    n = sum(truth.values())
    assert all(est[k] >= truth[k] for k in truth)
    assert all(est[k] <= truth[k] + 3 * n // width for k in truth)


def test_estimate_matches_independent_reference(spark):
    """Accumulate the same positions with plain Python dicts — the
    Spark sketch's estimates must match that reference EXACTLY."""
    df = _zipfish(spark, 500)
    width, depth = 64, 4
    pos_rows = df.select(
        "k", cms_positions("k", width, depth).alias("p")
    ).collect()
    cells: dict[tuple[int, int], int] = {}
    for r in pos_rows:
        for j, p in enumerate(r.p):
            cells[(j, p)] = cells.get((j, p), 0) + 1
    ref = {}
    seen = {}
    for r in pos_rows:
        if r.k in seen:
            continue
        seen[r.k] = True
        ref[r.k] = min(cells[(j, p)] for j, p in enumerate(r.p))
    sketch = cms_build(df, "k", width=width, depth=depth)
    est = {r.k: r.est for r in
           cms_estimate(sketch, df.select("k").distinct(), "k").collect()}
    assert est == ref


def test_merge_equals_oneshot_exactly(spark):
    a = _zipfish(spark, 700)
    b = spark.range(300).select(F.concat(F.lit("other"), F.expr("id % 9")).alias("k"))
    merged = cms_merge(
        cms_build(a, "k", width=128, depth=4),
        cms_build(b, "k", width=128, depth=4),
    )
    oneshot = cms_build(a.unionByName(b), "k", width=128, depth=4)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, oneshot.collect()))


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 2)], "k string, w bigint"
    )
    sketch = cms_build(df, "k", width=64, depth=3, weight_col="w")
    est = {r.k: r.est for r in
           cms_estimate(sketch, df.select("k").distinct(), "k").collect()}
    assert est["a"] >= 15 and est["b"] >= 2


def test_deterministic_across_partitionings(spark):
    df = _zipfish(spark)
    s1 = cms_build(df.repartition(1), "k", width=128, depth=4)
    s2 = cms_build(df.repartition(16), "k", width=128, depth=4)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_sketch_is_bounded_and_estimate_broadcasts(spark):
    df = _zipfish(spark, 5000)
    width, depth = 32, 3
    sketch = cms_build(df, "k", width=width, depth=depth)
    assert sketch.count() <= width * depth
    q = cms_estimate(sketch, df.select("k").distinct(), "k")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_validates_params_and_shapes(spark):
    df = _zipfish(spark, 10)
    with pytest.raises(ValueError, match="width"):
        cms_build(df, "k", width=1, depth=3)
    with pytest.raises(ValueError, match="depth"):
        cms_build(df, "k", width=64, depth=0)
    with pytest.raises(ValueError, match="at least one"):
        cms_merge()
    mixed = cms_build(df, "k", width=64, depth=3).unionByName(
        cms_build(df, "k", width=128, depth=3)
    )
    with pytest.raises(ValueError, match="mixed sketch shapes"):
        cms_estimate(mixed, df.select("k").distinct(), "k")


def test_absent_key_estimates_reflect_only_collisions(spark):
    df = _zipfish(spark, 200)
    sketch = cms_build(df, "k", width=4096, depth=5)
    ghost = spark.createDataFrame([("never_seen_xyz",)], "k string")
    est = cms_estimate(sketch, ghost, "k").first().est
    # wide sketch, 40 keys: overwhelmingly likely some row has no collision
    assert est == 0
