"""Bucketed (pre-shuffled) tables — shuffle-free co-located joins.

The reference's answer to expensive joins is to materialize them away
(denormalization "to avoid joining", README.md:29,113). Bucketing is the
Spark-native middle ground: pay the shuffle ONCE at write time
(``bucketBy(n, key)``), and every later join/aggregation on that key reads
both sides already hash-partitioned — Catalyst's EnsureRequirements sees the
bucket spec satisfies the join's HashClusteredDistribution and plans a
sort-merge join with NO Exchange on either side.

At the 100 TB design point this is the difference between re-shuffling the
fact table on every query and never shuffling it at all: bucket the fact
tables on their join key at ingest (the EP1/EP2 write path), and the daily
join/agg workload becomes scan + sort + merge. ``sortBy`` at write time
additionally lets single-file buckets skip the sort.

Both sides must use the same bucket count (or a divisor, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str] | str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet catalog table hash-bucketed on
    ``bucket_cols``. The write shuffles by the bucket function once; reads
    report ``HashPartitioning(bucket_cols, n_buckets)`` to the planner."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table_name)


def append_to_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str] | str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Incremental ingest into a bucketed fact: append a delta batch
    while PRESERVING the bucket layout — each new row hashes into its
    bucket (one more file per touched bucket per batch), so the
    co-located zero-Exchange join property survives every append. The
    bucket spec must match the existing table's; Spark validates and
    fails loudly on a mismatch rather than silently degrading the
    layout.

    This is the maintenance story for the ladder's bucketed rung
    (q46): new orders APPEND (this), and the rungs that also need
    delete-matching updates are the year-partitioned ones —
    operators/denorm.upsert_sales_denorm / rollup.upsert_pricing_rollup
    — because replacing rows in place needs a partition (or a
    transactional format) to scope the rewrite; a bucketed-only table
    has no sub-table rewrite unit. Compact small per-batch bucket files
    on the usual cadence (maintenance.compact_parquet per bucket keeps
    files-per-bucket bounded; the bucket id is in the file name)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.format("parquet").mode("append").bucketBy(n_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys. When both were
    written by ``write_bucketed_table`` with the same bucket count, the
    physical plan contains no Exchange (asserted in tests/test_bucketed.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
