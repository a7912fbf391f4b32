"""Histogram-rollup tests: crafted bin placement, merge = direct build,
quantile estimate within one bin width of the exact percentile."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.histogram import (
    build_histogram_cells,
    histogram_quantiles,
    merge_histogram_cells,
)
from tests.conftest import SF_CORRECT


def test_bin_placement_and_exact_counts(spark):
    rows = [("a", 0.0), ("a", 4.99), ("a", 5.0), ("a", 12.0), ("b", 7.5)]
    df = spark.createDataFrame(rows, ["g", "v"])
    cells = {
        (r["g"], r["bin_id"]): r["n"]
        for r in build_histogram_cells(df, "v", ["g"], 5.0).collect()
    }
    assert cells == {("a", 0): 2, ("a", 1): 1, ("a", 2): 1, ("b", 1): 1}


def test_merge_equals_direct_build(spark):
    """Merging day-grain cells to type grain must equal building type
    cells straight from raw — the associativity the layout exists for."""
    ev = load_table(spark, SF_CORRECT, "events").withColumn(
        "day", F.to_date("ts")
    )
    merged = merge_histogram_cells(
        build_histogram_cells(ev, "value", ["day", "event_type"], 5.0),
        ["event_type"],
    )
    direct = build_histogram_cells(ev, "value", ["event_type"], 5.0)
    a = {(r["event_type"], r["bin_id"]): r["n"] for r in merged.collect()}
    b = {(r["event_type"], r["bin_id"]): r["n"] for r in direct.collect()}
    assert a == b


def test_quantile_edge_within_one_bin_of_exact(spark):
    """The histogram p50/p90 lower edge brackets the exact sort-based
    percentile: edge <= exact value < edge + width."""
    ev = load_table(spark, SF_CORRECT, "events")
    cells = build_histogram_cells(ev, "value", ["event_type"], 5.0)
    qs = {
        (r["event_type"], r["q_num"], r["q_den"]): r
        for r in histogram_quantiles(cells, ["event_type"], 5.0).collect()
    }
    for (etype, qn, qd), r in qs.items():
        exact = ev.filter(F.col("event_type") == etype).selectExpr(
            f"percentile(value, {qn}/{qd}) as p"
        ).head()["p"]
        # ceil-target convention => the exact percentile (type-7 interp)
        # can sit just below the crossing bin's edge, never a full bin off
        assert r["q_edge"] - 5.0 <= exact < r["q_edge"] + 5.0, (etype, qn, exact, r)
        assert r["n_total"] == ev.filter(F.col("event_type") == etype).count()
