"""Mergeable fixed-bin histograms — the warehouse answer to percentiles
over rollups.

q28's exact percentiles and percentile_approx sketches answer one-shot
queries; a RECURRING percentile workload wants a layout, like q47's
pricing rollup answers q1 and q62's HLL cells answer distinct counts:
histogram cells ``(grain..., bin_id, n)`` are exact integers, merge by
summing ``n`` (associative/commutative — re-aggregating to any coarser
grain is a groupBy-sum, never a re-scan of raw data), and any quantile
reads as the first bin whose cumulative count crosses the exact integer
target ``ceil(q * total)``. Estimation error is bounded by bin width —
the practitioner's deal (Prometheus/Monarch histograms, Redshift-style
binned stats) at 100 TB: the raw-data pass happens once per ingest
window, every later percentile query touches only cell counts.

All arithmetic is engine-exact on purpose: ``bin_id = floor(value /
width)`` is one double op both engines evaluate identically, the
quantile target is integer arithmetic (``(q_num * total + q_den - 1)
div q_den``), and the reported edge ``bin_id * width`` is an exact
double for sane widths — so the whole read path value-oracles (q67).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def build_histogram_cells(
    df: DataFrame,
    value_col: str,
    grain: Sequence[str],
    bin_width: float,
) -> DataFrame:
    """ONE pass over raw data → exact cells ``(*grain, bin_id, n)``.
    The only data-sized shuffle in the layout's life; everything after
    runs on cells (|grain| x occupied bins rows)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    return (
        df.select(
            *grain,
            F.floor(F.col(value_col) / bin_width).cast("long").alias("bin_id"),
        )
        .groupBy(*grain, "bin_id")
        .agg(F.count("*").alias("n"))
    )


def merge_histogram_cells(
    cells: DataFrame, coarser_grain: Sequence[str]
) -> DataFrame:
    """Re-aggregate cells to a coarser grain: groupBy-sum, cell-sized."""
    return cells.groupBy(*coarser_grain, "bin_id").agg(F.sum("n").alias("n"))


def histogram_quantiles(
    cells: DataFrame,
    grain: Sequence[str],
    bin_width: float,
    quantiles: Sequence[tuple[int, int]] = ((1, 2), (9, 10)),
) -> DataFrame:
    """Per grain group: for each quantile q_num/q_den, the lower edge of
    the first bin whose running count reaches ``ceil(q * total)`` —
    integer-exact target, bounded-by-width estimate.

    Output: ``*grain, q_num, q_den, n_total, qbin, q_edge``. Cell-sized
    work: one window over bins within each group, then one row per
    (group, quantile)."""
    w = Window.partitionBy(*grain).orderBy("bin_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy(*grain)
    cum = cells.withColumn("cum_n", F.sum("n").over(w)).withColumn(
        "n_total", F.sum("n").over(tot)
    )
    outs = []
    for q_num, q_den in quantiles:
        target = F.expr(f"({q_num}L * n_total + {q_den} - 1) div {q_den}")
        hit = (
            cum.filter(F.col("cum_n") >= target)
            .groupBy(*grain, "n_total")
            .agg(F.min("bin_id").alias("qbin"))
            .select(
                *grain,
                F.lit(q_num).alias("q_num"),
                F.lit(q_den).alias("q_den"),
                "n_total",
                "qbin",
                (F.col("qbin") * F.lit(bin_width)).alias("q_edge"),
            )
        )
        outs.append(hit)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
