"""k-anonymity audit + enforcement over quasi-identifier columns
(round 15 — the privacy-release face of the PII family in
functions/text.py: masking scrubs DIRECT identifiers; k-anonymity
bounds re-identification through quasi-identifier COMBINATIONS, the
Sweeney (2002) model a BI warehouse applies before publishing an
extract or handing a slice to training).

Semantics (closed-form so the oracle replays them exactly):

* an equivalence class is one distinct tuple of the quasi columns
  (NULLs group together, Spark and DuckDB agree on groupBy-NULL);
* the dataset is k-anonymous iff every class has >= k rows;
* :func:`suppress_below_k` drops the rows of small classes (the strict
  release); :func:`generalize_below_k` keeps them with every quasi
  column overwritten by a placeholder — after which those rows form
  ONE merged class whose size is the sum of the suppressed classes
  (still possibly < k for a tiny total; callers re-audit).

Scale shape: one partial-aggregated groupBy over the quasi tuple for
class sizes, then one hash join back on the same key (the class-size
frame is |distinct tuples| rows — broadcastable in practice, and the
join key equals the aggregation key so AQE plans it cheaply). Nothing
is collected; no window over the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _class_sizes(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    return df.groupBy(*quasi_cols).agg(F.count("*").alias("__class_n"))


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Per-equivalence-class audit: the quasi tuple, its row count, and
    ``anonymous`` (count >= k). The release gate reads the summary; the
    rows with ``anonymous = false`` are the work list."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return _class_sizes(df, quasi_cols).select(
        *quasi_cols,
        F.col("__class_n").alias("class_size"),
        (F.col("__class_n") >= k).alias("anonymous"),
    )


def suppress_below_k(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Rows whose equivalence class has >= k members — the strict
    k-anonymous release (small classes dropped entirely)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    big = _class_sizes(df, quasi_cols).filter(F.col("__class_n") >= k).drop(
        "__class_n"
    )
    return df.join(big, quasi_cols, "left_semi")


def generalize_below_k(
    df: DataFrame, quasi_cols: list[str], k: int, placeholder: str = "*"
) -> DataFrame:
    """Every row kept; quasi columns of sub-k classes overwritten by
    ``placeholder`` (cast to each column's type via string — callers
    with non-string quasi columns get the placeholder as a string
    column, stated plainly: generalization changes the column type to
    string, the standard full-suppression cell form)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sizes = _class_sizes(df, quasi_cols)
    joined = df.join(sizes, quasi_cols, "left")
    small = F.col("__class_n") < k
    out_cols = []
    for c in df.columns:
        if c in quasi_cols:
            out_cols.append(
                F.when(small, F.lit(placeholder))
                .otherwise(F.col(c).cast("string"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)
