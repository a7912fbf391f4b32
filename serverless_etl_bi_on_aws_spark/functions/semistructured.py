"""Semi-structured event properties as VARIANT — schema-on-read that
keeps per-row heterogeneity.

The reference's event feed is third-party JSON (README.md:160-161) whose
``properties`` blob drifts: fields appear and disappear per SDK version,
and the same field changes type across producers. The classic Spark
answers both lose information — ``from_json`` needs one fixed schema (a
type-drifted row nulls silently), and ``get_json_object`` re-parses the
raw text per extraction. Spark 4's VARIANT type is the engine-native
answer: parse ONCE into a compact binary encoding, then typed path
extraction (``variant_get``) at columnar speed, with per-row structure
preserved (``schema_of_variant`` tells you what a row actually carried).

Contract notes (pinned by q93 + tests):
  * ``try_parse_json`` -> NULL variant on malformed JSON (the quarantine
    signal — pair it with the raw string to dead-letter);
  * a MISSING path extracts as NULL under both strict and try forms;
  * a type-MISMATCHED path errors under ``variant_get`` (ANSI) and
    NULLs under ``try_variant_get`` — so "field present but wrong type"
    is distinguishable from "field absent" by combining the two;
  * numeric->string variant casts succeed (``try_variant_get(v, p,
    'string')`` of an int yields its decimal text) — type COUNTS must
    therefore probe with the NARROW type, not string.

Scale: all of this is JVM columnar expression work — one parse per row,
no Python, no shuffle; extraction pushes through whole-stage codegen
like any other projection. At 100 TB the pattern is parse at ingest,
store the VARIANT in parquet (Spark writes it as its binary encoding),
extract at query time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def json_to_variant(
    df: DataFrame,
    json_col: str,
    out_col: str = "props",
    quarantine_col: str | None = None,
) -> DataFrame:
    """Parse a JSON-string column into a VARIANT column, tolerantly.

    Malformed JSON yields a NULL variant instead of failing the feed
    (the PERMISSIVE discipline of sources/formats applied to embedded
    blobs). With ``quarantine_col``, the raw string is preserved there
    for exactly the rows that failed to parse (NULL elsewhere) — the
    dead-letter column; the original ``json_col`` is dropped either way.
    """
    parsed = df.withColumn(out_col, F.try_parse_json(F.col(json_col)))
    if quarantine_col is not None:
        parsed = parsed.withColumn(
            quarantine_col,
            F.when(
                F.col(out_col).isNull() & F.col(json_col).isNotNull(),
                F.col(json_col),
            ),
        )
    return parsed.drop(json_col)


def variant_field(col: str | Column, path: str, dtype: str) -> Column:
    """Typed path extraction that treats type drift as data, not error:
    missing path -> NULL, mismatched type -> NULL (``try_variant_get``).
    Use :func:`variant_field_strict` when a mismatch should fail the job.
    """
    v = F.col(col) if isinstance(col, str) else col
    return F.try_variant_get(v, path, dtype)


def variant_field_strict(col: str | Column, path: str, dtype: str) -> Column:
    """Typed path extraction that ERRORS on a type-mismatched value
    (ANSI ``variant_get``); a missing path is still NULL — absence is
    normal in semi-structured feeds, drift you asked to be strict about
    is not."""
    v = F.col(col) if isinstance(col, str) else col
    return F.variant_get(v, path, dtype)


def variant_has_type(col: str | Column, path: str, dtype: str) -> Column:
    """TRUE iff ``path`` exists AND carries a ``dtype``-castable value —
    distinguishes "present but drifted" (FALSE) from "absent" (NULL).
    Probe with the narrow type: numeric->string casts succeed, so
    ``dtype='string'`` would report TRUE for numbers too."""
    v = F.col(col) if isinstance(col, str) else col
    present = F.try_variant_get(v, path, "variant").isNotNull()
    typed = F.try_variant_get(v, path, dtype).isNotNull()
    return F.when(present, typed)
