"""Dynamic file discovery + parameterized single-file jobs.

The reference's last milestone (README.md:168): "PERFORM ETL ON ALL THE
FILE WHICH ARE PRESENT IN S3 INSTEAD OF HARDCODING ... applying logic in
filename" — plus the Lambda-parameterized variant that processes exactly one
named file per run (README.md:90, argument name shared between Lambda and
the PySpark job). In Spark, discovery is a glob path and per-file lineage is
``input_file_name()`` — no orchestration code at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def ingest_all_files(
    spark: SparkSession,
    glob_path: str,
    fmt: str = "csv",
    with_lineage: bool = True,
    **options,
) -> DataFrame:
    """S7 (README.md:168): process every file under a prefix in one job.
    ``_source_file`` (basename, no extension) carries the reference's
    filename logic — e.g. routing rows by source file or year encoded in the
    name. One Spark job regardless of file count; at scale the file listing
    itself is distributed by the InMemoryFileIndex."""
    reader = spark.read.options(**({"header": True} | options)) if fmt == "csv" else spark.read.options(**options)
    df = getattr(reader, fmt)(glob_path)
    if with_lineage:
        df = df.withColumn(
            "_source_file",
            F.regexp_extract(F.input_file_name(), r"([^/]+?)(\.\w+)?$", 1),
        )
    return df


def ingest_named_file(
    spark: SparkSession,
    prefix: str,
    name: str,
    fmt: str = "csv",
    **options,
) -> DataFrame:
    """S8 (README.md:90): the Lambda-argument pattern — transform exactly one
    file identified by ``name`` (e.g. "2016_funnel"). Idempotent per file:
    re-running the same name reprocesses only that file, which is how the
    reference avoids "applying transformation to same file again and again"
    (README.md:128)."""
    return ingest_all_files(spark, f"{prefix}/{name}.{fmt}", fmt=fmt, **options)
