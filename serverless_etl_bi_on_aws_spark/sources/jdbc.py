"""JDBC source (S3): the RDS-MySQL extract of EP1.

The reference pulls full tables plus a trailing-3-month slice from MySQL
over the RDS endpoint hourly (README.md:9, 53-60). Spark's JDBC source
subsumes the whole Data-Pipeline-on-EC2 arrangement: predicates push down to
the database, and ``partitionColumn/lowerBound/upperBound/numPartitions``
parallelize the extract across executors (the reference is single-stream).

No MySQL server or driver jar ships in this container, so this module is a
thin, unit-testable option builder; the integration is exercised only when a
JDBC URL is provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    **options,
) -> DataFrame:
    """Build a JDBC read. Exactly one of ``table``/``query``.

    For the reference's hourly incremental (README.md:60, 147) pass the
    windowed SELECT as ``query`` — Spark sends it verbatim, so the WHERE
    executes in MySQL exactly like the reference's Data Pipeline SQL. For
    the one-time backfill (README.md:55) prefer ``table`` +
    ``partition_column`` on the key so the extract runs in parallel.
    """
    if (table is None) == (query is None):
        raise ValueError("provide exactly one of table= or query=")
    reader = spark.read.format("jdbc").option("url", url).option("fetchsize", fetch_size)
    if table:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if partition_column is not None:
        if table is None:
            raise ValueError("partitioned reads require table=, not query=")
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partitioned reads need lower_bound/upper_bound/num_partitions")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
