"""Mergeable distinct-count sketches — the missing piece of the rollup
story (operators/rollup.py, q32/q57's continuous aggregates).

Every additive measure in a materialized rollup re-aggregates freely
(sums of exact scaled longs, counts), but COUNT(DISTINCT user) does not:
exact distinct counts are not mergeable across buckets, which is why the
streaming twin q48 had to drop q32's ``n_users`` column. The standard
warehouse answer is to store a MERGEABLE sketch per fine-grained cell and
union sketches at query time — Spark 4 ships Apache DataSketches HLL
natively (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``, all JVM-side aggregates with map-side partial
combine, no UDFs).

Union exactness: two HLL sketches with the same lgK union by taking
per-register maxima, so estimate(union of per-bucket sketches) ==
estimate(one sketch over the whole data) EXACTLY — the rollup layout
cannot change the answer, only the sketch's inherent approximation can
(~1.6% at the lgK=12 default; exact in sparse mode at small
cardinalities). Both properties are pytest-pinned.

100 TB shape: the sketch column rides the same dynamic-partition-
overwrite maintenance as the pricing rollup's exact partials; a
coarse-grain query is a groupBy + ``hll_union_agg`` over rollup rows
(buckets x groups, never data-sized).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def hll_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    lgk: int = 12,
    sketch_col: str = "user_sketch",
) -> DataFrame:
    """Fine-grained rollup cell: one HLL sketch of ``distinct_col`` per
    group (plus the row count, the trivially-additive measure). This is
    the write-once/maintain-incrementally layout; store it partitioned
    like the pricing rollup."""
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n_rows"),
        F.hll_sketch_agg(distinct_col, F.lit(lgk)).alias(sketch_col),
    )


def hll_merge_estimate(
    rollup: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "user_sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Coarse-grained query over the sketch rollup: union the cell
    sketches per output group and estimate. Shuffles buckets x groups
    rows carrying one ~2^lgK-byte sketch each — never the fact table."""
    return rollup.groupBy(*group_cols).agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(estimate_col),
    )
