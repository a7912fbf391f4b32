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


def test_kmv_sample_merge_equals_global_and_deterministic(spark):
    """Round 17: the KMV bottom-k sample is (a) a fixed function of the
    data — identical under any repartitioning; (b) MERGEABLE with zero
    error: bottom-k of the union of per-part bottom-k's equals the
    global bottom-k (the hash order is a total order on rows); (c)
    min(k, |group|)-sized per group; (d) k<=0 refused."""
    from serverless_etl_bi_on_aws_spark.operators.sketches import kmv_sample

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", (i * 37) % 101) for i in range(300)],
        "id bigint, g string, v bigint",
    )
    s = sorted(map(tuple, kmv_sample(df, ["g"], "id", k=20).collect()))
    again = sorted(
        map(tuple, kmv_sample(df.repartition(11), ["g"], "id", k=20).collect())
    )
    assert again == s
    p1 = kmv_sample(df.filter("id % 2 = 0"), ["g"], "id", k=20)
    p2 = kmv_sample(df.filter("id % 2 = 1"), ["g"], "id", k=20)
    merged = sorted(
        map(tuple, kmv_sample(p1.unionByName(p2), ["g"], "id", k=20).collect())
    )
    assert merged == s
    tiny = kmv_sample(df.filter("id < 5"), ["g"], "id", k=20)
    assert tiny.count() == 5  # min(k, group size)
    with pytest.raises(ValueError, match="k must"):
        kmv_sample(df, ["g"], "id", k=0)


def test_kmv_quantiles_nearest_rank_exact(spark):
    """The quantile pick is the nearest-rank-lower element of the
    sorted sample — verified against a hand computation with k covering
    the whole group (sample == population -> estimates are the exact
    population quantiles); permille bounds refused outside [0,1000]."""
    from serverless_etl_bi_on_aws_spark.operators.sketches import (
        kmv_quantiles,
        kmv_sample,
    )

    rows = [(i, "g", v) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])]
    df = spark.createDataFrame(rows, "id bigint, g string, v bigint")
    s = kmv_sample(df, ["g"], "id", k=100)  # whole population
    got = {
        (r.q_permille): r.est
        for r in kmv_quantiles(s, ["g"], "v", "id", (0, 500, 900, 1000)).collect()
    }
    # n=10: idx = (9*q)//1000 -> 0, 4, 8, 9
    assert got == {0: 10, 500: 50, 900: 90, 1000: 100}
    with pytest.raises(ValueError, match="q_permille"):
        kmv_quantiles(s, ["g"], "v", "id", (1500,))


def test_kmv_plan_no_python_no_data_sized_second_exchange(spark):
    """Plan pin for the q128 shape: the sketch pipeline is pure JVM (no
    Python stage) and past the first per-group sample window every
    exchange moves k-sized samples, not data — the second window's
    exchange reuses the same group key."""
    from serverless_etl_bi_on_aws_spark.operators.sketches import (
        kmv_quantiles,
        kmv_sample,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 4}", i * 7 % 53) for i in range(400)],
        "id bigint, g string, v bigint",
    )
    q = kmv_quantiles(kmv_sample(df, ["g"], "id", k=16), ["g"], "v", "id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # both windows partition on the group key; the sample filter sits
    # between them, so the second window can ride the first's
    # partitioning (AQE may still insert an exchange — but never a
    # data-sized one: the input is <= k rows per group)
    assert plan.count("Window") >= 2, plan
