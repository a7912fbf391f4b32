"""Data-quality expectations — declarative checks over a table, compiled
into ONE aggregate scan (the Deequ/Great-Expectations pattern; Deequ is
the AWS-native tool the reference's Glue/Redshift pipeline would bolt on
— README.md:134-170 ships data between five systems with no validation
stage at all).

Each check is a (name, violation-predicate) pair; ``run_checks`` folds
every predicate into a single ``agg`` so the whole suite costs one pass
over the table — no per-check jobs, no shuffle (a count-style aggregate
is map-side partials + a 1-row reduce). Referential checks
(:func:`foreign_key`) are the exception: each costs one LEFT ANTI join
against the referenced key set (broadcast when the dim is small — the
usual case).

Output: one row per check — ``check, col, n_violations, passed`` — a
driver-gateable report (exact integer counts; see q66's oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


class Check:
    """A named violation predicate over one table."""

    def __init__(self, name: str, col: str, violation: Column):
        self.name = name
        self.col = col
        self.violation = violation


def not_null(col: str) -> Check:
    return Check("not_null", col, F.col(col).isNull())


def in_range(col: str, lo=None, hi=None) -> Check:
    if lo is None and hi is None:
        raise ValueError("in_range needs at least one bound")
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return Check("in_range", col, cond | F.col(col).isNull())


def accepted_values(col: str, values: Sequence) -> Check:
    return Check(
        "accepted_values", col, ~F.col(col).isin(list(values)) | F.col(col).isNull()
    )


def matches_regex(col: str, pattern: str) -> Check:
    return Check(
        "matches_regex",
        col,
        ~F.col(col).rlike(pattern) | F.col(col).isNull(),
    )


def unique(col: str) -> Check:
    """Marker check — uniqueness is not a per-row predicate; ``run_checks``
    computes it as count(col) - count(distinct col) in the same pass.
    Both sides skip NULLs, so the check counts only duplicated NON-NULL
    values: [1, 2, NULL, NULL] has 0 violations (count(*) on the left —
    the original formulation — reported every NULL row as a duplicate).
    NULL handling is ``not_null``'s job; compose both to assert a key."""
    return Check("unique", col, F.lit(None))


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregate pass; returns the report
    (``check, col, n_violations, passed``), one row per check, in the
    order given."""
    aggs = []
    for i, c in enumerate(checks):
        if c.name == "unique":
            aggs.append(
                (F.count(F.col(c.col)) - F.count_distinct(F.col(c.col))).alias(f"_v{i}")
            )
        else:
            aggs.append(
                F.sum(F.when(c.violation, 1).otherwise(0)).cast("bigint").alias(f"_v{i}")
            )
    # ONE aggregate, then unpivot the single result row with an explode —
    # a per-check select-and-union would make Catalyst re-derive the agg
    # (and re-scan the table) once per check.
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("_ord"),
                F.lit(c.name).alias("check"),
                F.lit(c.col).alias("col"),
                F.col(f"_v{i}").cast("bigint").alias("n_violations"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return (
        row.select(F.explode(entries).alias("r"))
        .select(
            "r._ord",
            "r.check",
            "r.col",
            "r.n_violations",
            (F.col("r.n_violations") == 0).alias("passed"),
        )
        .orderBy("_ord")
        .drop("_ord")
    )


def foreign_key(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """Referential-integrity report row: child keys with no parent.
    One LEFT ANTI join (broadcast under AQE when the parent key set is
    small); NULL child keys count as orphans (use not_null separately to
    distinguish)."""
    orphans = child.select(F.col(child_col)).join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    )
    return orphans.agg(F.count("*").cast("bigint").alias("n_violations")).select(
        F.lit("foreign_key").alias("check"),
        F.lit(child_col).alias("col"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
