"""CSV source with the reference's parse contract.

The reference ingests CSV twice: MySQL ``LOAD DATA ... FIELDS TERMINATED BY
',' ENCLOSED BY '"' IGNORE 1 LINES`` (README.md:17-19, S1) and Redshift
``COPY ... CSV QUOTE '"' DELIMITER ',' acceptinvchars`` (README.md:32-35,
S2). Contract: comma-delimited, double-quoted fields, one header line
skipped, and *invalid characters tolerated, not fatal* (acceptinvchars
replaces them with '?').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructType


def read_csv_contract(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    accept_invalid_chars: bool = True,
) -> DataFrame:
    """CSV scan per README.md:17-19/32-35: ``,`` delimiter, ``"`` quote,
    header line skipped, permissive parsing (malformed rows become nulls in
    a ``_corrupt_record``-free projection rather than failing the job —
    Spark's PERMISSIVE mode is the acceptinvchars analog at row level).

    With no schema, columns are inferred (the Glue-crawler behavior, S6);
    production callers pass an explicit ``StructType`` — inference costs an
    extra pass and is banned on the 100 TB path.
    """
    reader = (
        spark.read.option("header", True)
        .option("sep", ",")
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if accept_invalid_chars:
        df = sanitize_invalid_chars(df)
    return df


def sanitize_invalid_chars(df: DataFrame, replacement: str = "?") -> DataFrame:
    """Column-level ``acceptinvchars`` (README.md:35, 146): replace
    non-printable/control characters in every string column instead of
    failing the load. JVM-side regexp — no UDF."""
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, StringType):
            out = out.withColumn(
                field.name,
                F.regexp_replace(F.col(field.name), r"[\x00-\x08\x0B\x0C\x0E-\x1F]", replacement),
            )
    return out
