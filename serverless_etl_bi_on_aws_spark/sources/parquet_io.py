"""Partitioned/compressed parquet sink + the funnel-file ETL (EP2).

The reference's Glue PySpark job reads the funnel CSV, casts the string
timestamp (README.md:124), derives year/month (README.md:87, 166), and
writes snappy parquet partitioned by (year, month) (README.md:83, 86) —
after which Athena queries become "major[ly]" faster (README.md:127).
Here that whole pipeline is :func:`funnel_file_etl`; the year/month
partition layout is what gives downstream queries partition pruning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from serverless_etl_bi_on_aws_spark.functions.datetime_fns import to_ts, with_year_month


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("year", "month"),
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """S5 (README.md:86-87): compressed parquet partitioned by the given
    columns. Hive-style directories -> static + dynamic partition pruning
    downstream. At 100 TB keep partition cardinality moderate (year/month =
    dozens of partitions) and let file sizing come from upstream
    repartitioning, not tiny per-task files."""
    df.write.mode(mode).option("compression", compression).partitionBy(
        *partition_cols
    ).parquet(path)


def funnel_file_etl(
    spark: SparkSession,
    source_df: DataFrame,
    out_path: str,
    ts_col: str = "ts",
    ts_fmt: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """EP2 end-to-end (README.md:85-87, 124, 163-166): cast string timestamp
    -> derive year/month -> write partitioned snappy parquet. Returns the
    re-read DataFrame (the crawler-recatalog step, README.md:127: partition
    discovery happens on read)."""
    typed = source_df
    if dict(source_df.dtypes).get(ts_col) == "string":
        typed = source_df.withColumn(ts_col, to_ts(ts_col, ts_fmt))
    enriched = with_year_month(typed, ts_col)
    write_partitioned_parquet(enriched, out_path, ("year", "month"), mode=mode)
    return spark.read.parquet(out_path)
