"""Materialized pricing rollup (operators/rollup.py): layout cannot change
values, the fixture satisfies the date-granularity precondition, and
incremental upsert equals a full rebuild."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.rollup import (
    build_pricing_rollup,
    pricing_summary_from_rollup,
    upsert_pricing_rollup,
)
from serverless_etl_bi_on_aws_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rollup_serves_q1_exactly(spark):
    """q47 (rollup-served) must be row-identical to q1 (raw scan): the
    exact scaled-long partials are associative, so splitting the sum
    between build and query time cannot move a cent."""
    assert _rows(QUERIES["q47_pricing_summary_rollup"](spark, SF)) == _rows(
        QUERIES["q1_pricing_summary"](spark, SF)
    )


def test_rollup_date_granularity_guard(spark):
    """The intraday counter must be zero on the fixture (every l_shipdate
    is midnight) — the precondition for serving a midnight timestamp
    cutoff from the date-keyed rollup."""
    rollup = build_pricing_rollup(load_table(spark, SF, "lineitem"))
    assert rollup.agg(F.sum("intraday")).head()[0] == 0


def test_rollup_is_tiny(spark):
    """The whole point: days x groups rows, not fact rows."""
    rollup = build_pricing_rollup(load_table(spark, SF, "lineitem"))
    n_rollup = rollup.count()
    n_fact = load_table(spark, SF, "lineitem").count()
    assert n_rollup < n_fact / 3  # sf0.01: ~15k vs 60k; ratio grows with sf


def test_upsert_equals_full_rebuild(spark):
    """upsert(rollup(A), B) == rollup(A u B), and only the touched year
    partitions are rewritten."""
    li = load_table(spark, SF, "lineitem")
    # deterministic split: delta = one calendar year of rows (so the upsert
    # touches exactly one partition), base = everything else
    base = li.filter(F.year("l_shipdate") != 1997)
    delta = li.filter(F.year("l_shipdate") == 1997)
    assert delta.count() > 0

    with tempfile.TemporaryDirectory(prefix="rollup_upsert_") as d:
        path = os.path.join(d, "rollup")
        (build_pricing_rollup(base).repartition(1, "ship_year")
         .write.mode("overwrite").partitionBy("ship_year").parquet(path))
        pre = {
            y: os.path.getmtime(os.path.join(path, f"ship_year={y}"))
            for y in (1995, 1996, 1998)
            if os.path.exists(os.path.join(path, f"ship_year={y}"))
        }
        upsert_pricing_rollup(spark, path, delta)

        merged = spark.read.parquet(path)
        full = build_pricing_rollup(li)
        cols = sorted(c for c in full.columns)
        assert _rows(merged.select(*cols)) == _rows(full.select(*cols))
        # untouched year partitions were not rewritten
        for y, mtime in pre.items():
            assert os.path.getmtime(os.path.join(path, f"ship_year={y}")) == mtime

        # and the summary served from the upserted rollup still matches q1
        assert _rows(pricing_summary_from_rollup(merged, "2001-06-01")) == _rows(
            QUERIES["q1_pricing_summary"](spark, SF)
        )


def test_upsert_empty_delta_is_noop(spark):
    li = load_table(spark, SF, "lineitem")
    with tempfile.TemporaryDirectory(prefix="rollup_noop_") as d:
        path = os.path.join(d, "rollup")
        (build_pricing_rollup(li).repartition(1, "ship_year")
         .write.mode("overwrite").partitionBy("ship_year").parquet(path))
        before = _rows(spark.read.parquet(path))
        upsert_pricing_rollup(spark, path, li.limit(0))
        assert _rows(spark.read.parquet(path)) == before


def test_hll_sketch_rollup_merge_exact_and_bounded(spark):
    """operators/sketches.py: (a) estimate(union of per-bucket sketches)
    == estimate(one sketch over the whole data) EXACTLY (register-max
    union identity — the rollup layout cannot move the estimate), and
    (b) at genuinely-approximate cardinality (100k distinct, far past
    sparse mode) the lgK=12 estimate lands within 5% of exact."""
    from pyspark.sql import functions as F

    from serverless_etl_bi_on_aws_spark.operators.sketches import (
        hll_merge_estimate,
        hll_rollup,
    )

    n_distinct = 100_000
    df = spark.range(0, 400_000).select(
        (F.col("id") % n_distinct).alias("u"),
        (F.col("id") % 16).alias("bucket"),
        F.lit("g").alias("grp"),
    )
    cells = hll_rollup(df, ["grp", "bucket"], "u")
    merged = hll_merge_estimate(cells, ["grp"]).collect()[0]
    direct = df.groupBy("grp").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u", F.lit(12))).alias("est")
    ).collect()[0]
    assert merged["approx_distinct"] == direct["est"]  # union identity
    assert merged["n_rows"] == 400_000
    assert abs(merged["approx_distinct"] - n_distinct) <= n_distinct * 0.05
