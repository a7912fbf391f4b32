"""Compaction / clustering tests: file-count contract, data equality,
and footer-stats disjointness that makes skipping real."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.maintenance import (
    compact_parquet,
    file_column_stats,
)
from tests.conftest import SF_CORRECT


def _fragmented(spark, tmp_path, n_parts=40):
    path = str(tmp_path / "orders_frag")
    orders = load_table(spark, SF_CORRECT, "orders")
    orders.repartition(n_parts).write.mode("overwrite").parquet(path)
    return path, orders


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path, orders = _fragmented(spark, tmp_path)
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before == 40
    total_bytes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    after = compact_parquet(spark, path, target_file_bytes=total_bytes // 3)
    assert after < before and after <= 4
    got = spark.read.parquet(path)
    assert got.count() == orders.count()
    # content identical — exact scaled-long sums (a double SUM would vary
    # with summation order across layouts; see the q1 money-sum notes)
    cents = F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5d) AS BIGINT)"))
    a = got.agg(F.sum("o_orderkey"), cents).head()
    b = orders.agg(F.sum("o_orderkey"), cents).head()
    assert a == b


def test_clustered_rewrite_makes_stats_skippable(spark, tmp_path):
    """Before clustering every file spans ~the whole key range (stats
    prune nothing); after, per-file ranges are near-disjoint and a point
    lookup's key falls inside <= 2 files' [min, max]."""
    path, orders = _fragmented(spark, tmp_path)
    full_lo, full_hi = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).head()
    probe = (full_lo + full_hi) // 2

    def n_candidate_files():
        stats = file_column_stats(path, "o_orderkey")
        assert all(lo is not None for _, lo, _ in stats)
        return sum(1 for _, lo, hi in stats if lo <= probe <= hi)

    before_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_candidate_files() == before_files  # round-robin: no pruning
    total_bytes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n_after = compact_parquet(
        spark, path, target_file_bytes=total_bytes // 8, cluster_by="o_orderkey"
    )
    assert n_after >= 4
    # range-partitioned files: the probe key lives in at most 2 files
    # (boundary keys can straddle one edge)
    assert n_candidate_files() <= 2
    assert spark.read.parquet(path).count() == orders.count()
