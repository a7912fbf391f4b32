"""Vector math over ``array<float>`` embedding columns (north-star X3).

Pure higher-order-function compositions (``zip_with`` / ``aggregate`` /
``transform``) — executed in the JVM, no Python round-trip, so a cosine
top-k over a 100 TB embeddings table is a single codegen'd scan. Arrays are
cast to ``array<double>`` first so the fold accumulates in float64 exactly
like the DuckDB oracle (both fold left-to-right -> bit-identical results).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _as_double(v: str | Column) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-fold dot product: sum_i a[i]*b[i]."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: str | Column) -> Column:
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; same definition as DuckDB's
    ``list_cosine_similarity``."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
