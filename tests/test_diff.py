"""Table-diff tests: crafted add/remove/change/NULL semantics, stable
4-row summary, per-column attribution, one-join plan."""

from __future__ import annotations

from serverless_etl_bi_on_aws_spark.operators.diff import (
    changed_column_counts,
    table_diff_summary,
)


def _tables(spark):
    left = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", None),   # NULL on both sides -> unchanged (null-safe)
            (3, "c", 30.0),   # value changes
            (4, "d", 40.0),   # removed
            (5, None, 50.0),  # NULL -> value: changed, attributed to 'name'
        ],
        ["id", "name", "amount"],
    )
    right = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", None),
            (3, "c", 31.0),
            (5, "e", 50.0),
            (6, "f", 60.0),   # added
        ],
        ["id", "name", "amount"],
    )
    return left, right


def test_diff_summary_classes(spark):
    left, right = _tables(spark)
    got = {r["status"]: r["n_rows"] for r in table_diff_summary(left, right, ["id"]).collect()}
    assert got == {"added": 1, "removed": 1, "changed": 2, "unchanged": 2}


def test_changed_column_attribution(spark):
    left, right = _tables(spark)
    got = {r["col"]: r["n_changed"] for r in changed_column_counts(left, right, ["id"]).collect()}
    assert got == {"name": 1, "amount": 1}


def test_diff_single_join_plan(spark):
    """The summary costs one join of the two inputs — each side scanned
    once (2 scans total, 1 join) plus the tiny status frame."""
    left, right = _tables(spark)
    plan = (
        table_diff_summary(left, right, ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one data-sized join (FullOuter); the only other join is the
    # 4-row status zero-fill frame
    assert plan.count("FullOuter") == 1
    # each data input scanned once + the 4-row status literal frame
    assert plan.count("Scan ExistingRDD") <= 3
