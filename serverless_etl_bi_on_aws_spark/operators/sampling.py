"""Dataset splitting & sampling for training-data pipelines.

Not in the reference (its sampling is "look at it in QuickSight"), but any
LLM-data pipeline over this engine needs (a) a train/val/test assignment
that is *deterministic and cluster-stable* — the same row lands in the same
split on every run, every executor count, every engine — and (b) per-stratum
downsampling (e.g. cap each language/source at a fraction).

randomSplit() is NOT run-stable (partition-order dependent); the standard
fix is hashing a stable id into buckets. We use a Knuth multiplicative hash
(id * 2654435761 mod 100) — exact integer arithmetic any engine reproduces
(the DuckDB oracle runs the same formula), no murmur3 dependency. At 100 TB
it's a narrow projection: no shuffle, no state, pushes through AQE untouched.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F

#: Knuth's multiplicative constant (2^32 / golden ratio), prime-ish mixer.
_MIX = 2654435761


def split_bucket(id_col: str | Column, n_buckets: int = 100) -> Column:
    """Stable pseudo-random bucket in [0, n_buckets) from an integer id."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(col * F.lit(_MIX), F.lit(n_buckets))


def deterministic_split(
    df: DataFrame,
    id_col: str,
    cut_points: Mapping[str, int] | None = None,
) -> DataFrame:
    """Add a ``split`` column ("train"/"val"/"test" by default: 80/10/10).

    ``cut_points`` maps split name -> exclusive upper percentile bound,
    checked in ascending order; the last split takes the remainder.
    """
    cuts = dict(cut_points) if cut_points is not None else {"train": 80, "val": 90}
    bucket = split_bucket(id_col)
    expr: Column | None = None
    for name, bound in sorted(cuts.items(), key=lambda kv: kv[1]):
        expr = (
            F.when(bucket < bound, name)
            if expr is None
            else expr.when(bucket < bound, name)
        )
    expr = F.lit("test") if expr is None else expr.otherwise("test")
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    seed: int = 7,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`sampleBy`): cap over-represented
    strata (languages, sources) at a fraction. Seeded, but only
    *statistically* reproducible — for exact reproducibility across engines
    use deterministic_split-style bucketing on an id instead."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)
