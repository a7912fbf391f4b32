"""Distribution drift between two corpus snapshots (round 17).

A continuously-ingested training corpus drifts: a crawl source changes
its language mix, a boilerplate filter starts eating a domain, an
upstream dedup knob shifts the length distribution. The standard
monitoring statistic is the Population Stability Index

    PSI = sum over buckets of (p_b - q_b) * ln(p_b / q_b)

(symmetrized KL; the credit-scoring industry's drift metric, with the
conventional bands <0.1 stable / 0.1-0.25 shifting / >0.25 drifted).

Formulation follows the DSIR milli-nat discipline (operators/
selection.py, cross-engine-green since round 15): add-one smoothing on
BOTH sides over the union of observed buckets (an unseen bucket is
penalized, never infinite), per-bucket contributions rounded to BIGINT
MILLI-nats (``round(1000 * (p-q) * ln(p/q))``) so totals are order-free
integer sums and the DuckDB oracle reproduces every cell — the only
floats are the two ln() calls on identical doubles, the same accepted
surface as dsir_score.

Scale shape: two partial-agg counts (one per snapshot, map-side
combined, output = |buckets| rows), a full-outer join of two
bucket-sized frames, pure expressions after that. Nothing data-sized
past the first aggregates; works unchanged when the "snapshots" are
rollup cells rather than raw scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def psi_report(
    df_a: DataFrame,
    df_b: DataFrame,
    bucket_col: str,
    out_bucket: str = "bucket",
) -> DataFrame:
    """Per-bucket drift report between snapshot A (baseline) and B
    (current): ``(bucket, a_cnt, b_cnt, psi_milli)`` where psi_milli is
    the bucket's smoothed PSI contribution in milli-nats (BIGINT; can
    be negative only through rounding — the true contribution is
    >= 0). Total PSI = SUM(psi_milli) / 1000 nats. Buckets observed in
    either snapshot appear; both sides are add-one smoothed over that
    union's size."""
    a = df_a.groupBy(F.col(bucket_col).alias(out_bucket)).agg(
        F.count("*").alias("a_cnt")
    )
    b = df_b.groupBy(F.col(bucket_col).alias(out_bucket)).agg(
        F.count("*").alias("b_cnt")
    )
    joined = (
        a.join(b, out_bucket, "full_outer")
        .select(
            out_bucket,
            F.coalesce("a_cnt", F.lit(0)).cast("bigint").alias("a_cnt"),
            F.coalesce("b_cnt", F.lit(0)).cast("bigint").alias("b_cnt"),
        )
        .localCheckpoint(eager=False)
    )
    tot = joined.agg(
        F.sum("a_cnt").alias("_ta"),
        F.sum("b_cnt").alias("_tb"),
        F.count("*").alias("_nb"),
    )
    # totals are a 1-row broadcast-crossJoin (the q84-family pattern) so
    # the per-bucket expressions stay distributed
    out = joined.crossJoin(F.broadcast(tot))
    p = (F.col("a_cnt") + 1).cast("double") / (
        F.col("_ta") + F.col("_nb")
    ).cast("double")
    q = (F.col("b_cnt") + 1).cast("double") / (
        F.col("_tb") + F.col("_nb")
    ).cast("double")
    contrib = F.round((p - q) * (F.log(p) - F.log(q)) * 1000).cast("bigint")
    return out.select(
        out_bucket, "a_cnt", "b_cnt", contrib.alias("psi_milli")
    )


def bucketize_numeric(col, edges) -> "F.Column":
    """Engine-neutral bucket label for a numeric column under EXPLICIT
    edges (the continuous-column front of :func:`psi_report` — PSI over
    a length/score distribution needs a stable bucketing, and quantile-
    based edges drift with the data; fix the edges, monitor the mass).
    Labels are half-open ``"[lo,hi)"`` strings plus ``"<lo"`` / ``">=hi"``
    tails and ``"null"`` — pure nested CASE, codegen'd, reproducible
    anywhere."""
    c = F.col(col) if isinstance(col, str) else col
    edges = [float(e) for e in edges]
    # strictly increasing (r17 ADVICE): duplicate edges would emit an
    # unreachable "[x,x)" label and silently degenerate the bucketing
    if len(edges) < 2 or not all(a < b for a, b in zip(edges, edges[1:])):
        raise ValueError("edges must be >= 2 strictly increasing values")
    expr = F.when(c.isNull(), F.lit("null")).when(
        c < edges[0], F.lit(f"<{edges[0]:g}")
    )
    for lo, hi in zip(edges, edges[1:]):
        expr = expr.when(
            (c >= lo) & (c < hi), F.lit(f"[{lo:g},{hi:g})")
        )
    return expr.otherwise(F.lit(f">={edges[-1]:g}"))


def psi_report_from_counts(
    a_counts: DataFrame,
    b_counts: DataFrame,
    bucket_col: str = "bucket",
    count_col: str = "cnt",
) -> DataFrame:
    """:func:`psi_report` over PRE-AGGREGATED per-bucket counts — the
    rollup-stored path (drift between two stored histogram/rollup
    snapshots without rescanning either corpus). Same smoothing, same
    milli-nat contract; inputs are ``(bucket_col, count_col)`` frames
    (duplicate bucket rows re-sum, so partial rollup cells merge for
    free)."""
    a = a_counts.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.sum(count_col).cast("bigint").alias("a_cnt")
    )
    b = b_counts.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.sum(count_col).cast("bigint").alias("b_cnt")
    )
    joined = (
        a.join(b, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("a_cnt", F.lit(0)).cast("bigint").alias("a_cnt"),
            F.coalesce("b_cnt", F.lit(0)).cast("bigint").alias("b_cnt"),
        )
        .localCheckpoint(eager=False)
    )
    tot = joined.agg(
        F.sum("a_cnt").alias("_ta"),
        F.sum("b_cnt").alias("_tb"),
        F.count("*").alias("_nb"),
    )
    out = joined.crossJoin(F.broadcast(tot))
    p = (F.col("a_cnt") + 1).cast("double") / (
        F.col("_ta") + F.col("_nb")
    ).cast("double")
    q = (F.col("b_cnt") + 1).cast("double") / (
        F.col("_tb") + F.col("_nb")
    ).cast("double")
    contrib = F.round((p - q) * (F.log(p) - F.log(q)) * 1000).cast("bigint")
    return out.select("bucket", "a_cnt", "b_cnt", contrib.alias("psi_milli"))


def psi_total_milli(report: DataFrame) -> DataFrame:
    """One-row total: ``(psi_milli, drifted_100, drifted_250)`` — the
    conventional 0.10 / 0.25 PSI bands as exact integer comparisons on
    the milli-nat sum."""
    return report.agg(
        F.sum("psi_milli").cast("bigint").alias("psi_milli")
    ).select(
        "psi_milli",
        (F.col("psi_milli") >= 100).alias("drifted_100"),
        (F.col("psi_milli") >= 250).alias("drifted_250"),
    )
