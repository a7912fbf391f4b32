"""As-of (nearest-earlier) join — a custom operator Spark lacks natively.

Not in the reference's surface (its joins are all equi, SURVEY.md §2.3), but
a staple of the event/warehouse world this engine serves: "attach the most
recent right-side row at or before each left timestamp, per key" (prices to
trades, last-profile to event, last-purchase to view).

Implemented as a *composition of built-in operators* — union + partitioned
window + ignore-nulls last() — per the preference ladder (no applyInPandas
needed). One shuffle on (key), sorted within partitions; scales like any
windowed aggregation, with no per-group pandas materialization. Skew on a
hot key is handled by AQE or upstream salting like any other window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with right_ts <= left_ts (or < when ``allow_exact_matches=False``),
    matching on ``key``. Right rows with no match leave nulls — same
    semantics as ``pandas.merge_asof(direction="backward")``.

    Mechanics: tag and union both sides, sort per key by (ts, side-tag),
    forward-fill the right columns with ``last(ignorenulls)`` over an
    unbounded-preceding window, keep only left rows.
    """
    vcols = list(value_cols)
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)
    # side tag orders equal timestamps: right-before-left makes the exact
    # match visible to the fill; flipped for strict inequality
    right_tag, left_tag = (0, 1) if allow_exact_matches else (1, 0)
    r = right.select(
        # null placeholders for every left column (union alignment)
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left.columns],
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(right_tag).alias("_side"),
        *[F.col(c).alias(f"_asof_{c}") for c in vcols],
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias("_side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_asof_{c}") for c in vcols],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_asof_{c}", ignorenulls=True).over(w).alias(f"_filled_{c}")
            for c in vcols
        ],
    )
    keep_left = filled.filter(F.col("_side") == F.lit(left_tag))
    out = keep_left.select(
        *[c for c in left.columns],
        *[F.col(f"_filled_{c}").alias(f"asof_{c}") for c in vcols],
    )
    return out
