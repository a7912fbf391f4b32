"""Interval/range join — a custom operator Spark has no native plan for.

Not in the reference's surface (its joins are all equi on integer keys,
SURVEY.md §2.3), but essential for event analytics: "find every left row
whose timestamp falls inside a right-side interval [start, end)". Naive
Spark plans a pure range predicate as BroadcastNestedLoopJoin — O(|L|·|R|)
comparisons, which dies at scale.

The scale path here is the classic *binned* range join (the same strategy
DuckDB's IEJoin literature and Databricks' range-join hint use): quantize
time into fixed-width bins, explode each interval across the bins it
overlaps, equi-join on the bin id, then re-apply the exact predicate. The
O(|L|·|R|) nested loop becomes a hash join on bin keys whose cost is
O(|L| + |R|·bins_per_interval + |matches|).

All arithmetic is exact integer micros (``unix_micros … div``) — no
double-precision bin boundaries, no epoch-nanos overflow (see
catalog.load_table for the nanos story).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bin_seconds: int,
    broadcast_right: bool = False,
) -> DataFrame:
    """Inner-join ``left`` rows to every ``right`` interval containing them:
    ``right_start <= left_ts < right_end`` (end-exclusive).

    Column names of ``left`` and ``right`` must be disjoint (rename before
    calling). Empty/negative intervals match nothing.

    Each left row carries exactly one bin id and every interval is exploded
    over each bin it overlaps, so a matching (left, right) pair meets in
    exactly one bin — no post-join dedup needed.

    Scale notes: pick ``bin_seconds`` near the typical interval length so
    intervals explode to ~1-2 bins. The equi-join on bin id shuffles both
    sides unless ``broadcast_right=True`` (right side small, e.g. an
    incident/calendar table). Time-clustered data makes bin ids skewed —
    AQE skew-join handles it, or salt the bin like operators/skew.py.
    """
    if bin_seconds <= 0:
        raise ValueError("bin_seconds must be positive")
    width_us = int(bin_seconds) * 1_000_000

    binned_left = left.withColumn(
        "__bin", F.expr(f"unix_micros(`{left_ts}`) div {width_us}")
    )
    binned_right = (
        right.filter(F.col(right_end) > F.col(right_start))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros(`{right_start}`) div {width_us}"),
                    F.expr(f"(unix_micros(`{right_end}`) - 1) div {width_us}"),
                )
            ),
        )
    )
    if broadcast_right:
        binned_right = F.broadcast(binned_right)

    return (
        binned_left.join(binned_right, "__bin")
        .filter(
            (F.col(left_ts) >= F.col(right_start))
            & (F.col(left_ts) < F.col(right_end))
        )
        .drop("__bin")
    )
