"""Property-based tests (hypothesis) for the invariants that matter most:
merge idempotence and split stability. Small generated batches, few
examples — each example pays a Spark job, so the generators aim at edge
shapes (empty staging, all-overlap, no-overlap, duplicate keys) rather
than volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.operators.merge import merge_upsert
from serverless_etl_bi_on_aws_spark.operators.sampling import deterministic_split

KV = st.dictionaries(
    keys=st.integers(min_value=0, max_value=30),
    values=st.integers(min_value=-1000, max_value=1000),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(final=KV, staging=KV)
def test_merge_upsert_is_idempotent_upsert(spark, final, staging):
    fdf = spark.createDataFrame(
        [(k, v) for k, v in final.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    sdf = spark.createDataFrame(
        [(k, v) for k, v in staging.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())

    once = merge_upsert(fdf, sdf, ["k"])
    twice = merge_upsert(once, sdf, ["k"])
    got_once = {(r.k, r.v) for r in once.collect()}
    got_twice = {(r.k, r.v) for r in twice.collect()}

    # Staging wins on overlap; non-overlapping final survives; idempotent.
    expected = {(k, v) for k, v in final.items() if k not in staging} | set(
        staging.items()
    )
    assert got_once == expected
    assert got_twice == got_once


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=st.sets(st.integers(min_value=0, max_value=10**9), max_size=40))
def test_deterministic_split_total_and_stable(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids] or [(None,)], "doc_id long").filter(
        F.col("doc_id").isNotNull()
    )
    out = {
        (r.doc_id, r.split)
        for r in deterministic_split(df, "doc_id").collect()
    }
    # Total: every id assigned exactly one split, names from the contract.
    assert {i for i, _ in out} == ids
    assert {s for _, s in out} <= {"train", "val", "test"}
    # Stable under recomputation.
    again = {
        (r.doc_id, r.split)
        for r in deterministic_split(df, "doc_id").collect()
    }
    assert out == again
