"""Skew-aware join: key salting.

At 100 TB a single hot key (one power user, one default product id) can pin
an entire join on one task. AQE's skew-join splitter
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py) handles sort-merge
skew at runtime; explicit salting is the plan-level tool when you know the
skew in advance or need a shuffle-hash join: spread each hot left key over N
salt buckets and replicate the matching right rows N times, so the hot key's
work lands on N tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join on ``key`` with the left (big/skewed) side salted into
    ``n_salts`` buckets and the right side replicated per bucket. Result is
    row-identical to ``left.join(right, key, how)``; only the shuffle
    distribution changes. Supported ``how``: inner / left / left_outer.

    Cost model: right side is shuffled n_salts times its size — salt counts
    trade replication for parallelism, so size n_salts to the hot key's
    multiple of a task's fair share, not to the cluster width.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_left = left.withColumn(
        "_salt", (F.rand(seed) * n_salts).cast("int")
    )
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_left.join(replicated_right, on=[key, "_salt"], how=how)
    return out.drop("_salt")
