"""JSON-lines, ORC, and XML sources/sinks — the remaining built-in formats.

The reference's event feed is "sent by third party like Amplitude"
(README.md:160-161); such feeds arrive as JSON lines at least as often as
CSV, so the engine exposes the same contract for them as csv_source does
for CSV: explicit-or-inferred schema, PERMISSIVE parse with a quarantine
column for malformed records (the `acceptinvchars` discipline of
README.md:35 applied to JSON), and catalog-ready DataFrames out. ORC is
the columnar alternative some warehouses standardize on; Spark supports
it natively (vectorized reader, predicate pushdown) so the engine's
"partitioned compressed columnar" sink story (README.md:83-86) is
format-agnostic. XML rounds out the third-party-feed family (Spark 4's
in-tree StAX datasource): entity escaping is the reader/writer's job, and
the SAME quarantine contract applies — a malformed or wrong-typed row
element lands in ``_corrupt_record`` instead of failing the feed.

Scale notes: JSON/XML scans are CPU-heavier than parquet/ORC (per-row
text parse, no column pruning at the reader; XML additionally cannot
split inside a row element), so the 100 TB pattern is
json/xml -> one ETL pass -> partitioned parquet/ORC, exactly like the
reference's CSV->parquet conversion (README.md:125-127). Schema
inference samples the data (one extra pass); production paths pass an
explicit schema and skip it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Name of the quarantine column PERMISSIVE mode fills for bad records.
CORRUPT_COL = "_corrupt_record"


def read_json_lines(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSON-lines source with the engine's CSV-style tolerance contract.

    With an explicit ``schema``, malformed lines land in
    ``_corrupt_record`` (PERMISSIVE) instead of failing the job; by
    default they are dropped and the quarantine column is removed —
    pass ``keep_corrupt=True`` to route them to a dead-letter sink.
    Without a schema, Spark infers it (sampling pass — dev path only).
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if schema is not None:
        if isinstance(schema, T.StructType):
            schema = T.StructType(
                schema.fields + [T.StructField(CORRUPT_COL, T.StringType(), True)]
            )
        else:
            schema = f"{schema}, {CORRUPT_COL} STRING"
        df = reader.schema(schema).json(path)
        if keep_corrupt:
            return df
        return df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    return reader.json(path)


def write_partitioned_orc(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("year", "month"),
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """ORC twin of write_partitioned_parquet: compressed, hive-partitioned,
    vectorized-readable, filter-pushdown-capable."""
    df.write.mode(mode).option("compression", compression).partitionBy(
        *partition_cols
    ).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — native vectorized reader; Catalyst pushdown/pruning apply
    exactly as for parquet."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | str | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """XML source with the engine's quarantine contract (Spark 4 in-tree
    StAX datasource — no external package).

    With an explicit ``schema``, a malformed row element (unclosed tag,
    truncated document) or a wrong-typed field fills ``_corrupt_record``
    under PERMISSIVE instead of failing the job; wrong-typed rows keep
    their parseable fields alongside the quarantine payload, exactly like
    the JSON source. By default quarantined rows are dropped and the
    column removed — ``keep_corrupt=True`` routes them to a dead-letter
    sink. Entity decoding (&amp;lt; &amp;amp; ...) is the reader's job, so
    round-tripping markup-hostile strings is value-exact (q92 pins it).

    Same caveat as JSON (Spark disallows projecting ONLY the corrupt
    column): keep a data column in any aggregate over the quarantine
    column."""
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if schema is not None:
        if isinstance(schema, T.StructType):
            schema = T.StructType(
                schema.fields + [T.StructField(CORRUPT_COL, T.StringType(), True)]
            )
        else:
            schema = f"{schema}, {CORRUPT_COL} STRING"
        df = reader.schema(schema).load(path)
        if keep_corrupt:
            return df
        return df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink: one ``root_tag`` document per output file, one
    ``row_tag`` element per row, entities escaped by the writer. XML is a
    feed/interchange format, not a warehouse layout — at scale it exists
    to be CONSUMED by read_xml's one ETL pass into partitioned parquet."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).save(path)
