"""Similarity search over embedding columns (north-star X3; SURVEY.md §2.10).

Two tiers:
  * :func:`topk_cosine_bruteforce` — exact; one codegen'd scan + global
    top-k. Spark plans ``orderBy(desc).limit(k)`` as TakeOrderedAndProject:
    each partition keeps a k-heap and only k rows per partition reach the
    driver-side merge, so the exact path is shuffle-free and scales linearly.
  * :func:`topk_cosine_lsh` — approximate: random-hyperplane (SimHash) LSH
    prefilter, then exact re-ranking of the candidate set. At 100 TB the
    bucket predicate prunes the scan to ~candidates/2^bits of the data;
    persist the bucketed table sorted by bucket id to turn the probe into a
    partition-pruned lookup.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from serverless_etl_bi_on_aws_spark.functions.vectors import cosine, dot


def topk_cosine_bruteforce(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query becomes a literal array column (no join at all); score + heap
    top-k in one stage. Ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.withColumn("cosine", cosine(vec_col, q))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def with_lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``bucket_0 .. bucket_{n_tables-1}`` sign-pattern columns.

    Each table packs ``n_planes`` hyperplane sign bits into an int. The
    planes are deterministic (seeded) literals — identical on every executor
    with no broadcast needed. At scale, write this table bucketed/sorted by
    (bucket_i) once; probes then prune to matching buckets.
    """
    out = embeddings
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        bits = [
            F.when(dot(vec_col, F.array(*[F.lit(v) for v in p])) > 0, 1).otherwise(0)
            for p in planes
        ]
        packed = bits[0]
        for b in bits[1:]:
            packed = packed * 2 + b
        out = out.withColumn(f"bucket_{t}", packed)
    return out


def topk_cosine_ivf(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means-partition the corpus once, probe
    only the ``n_probe`` clusters nearest the query, exact-rerank inside.

    The 100 TB deployment shape: the clustering is a one-time build (the
    assignment column is persisted, ideally as the table's partition key so
    a probe is partition pruning); each query then scans n_probe/n_clusters
    of the data. Scan reduction is measurable via
    ``candidates = df.filter(pred).count()`` vs total.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.withColumn("_features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=n_clusters, seed=seed, featuresCol="_features").fit(feat)
    assigned = model.transform(feat).withColumnRenamed("prediction", "_cluster")
    centers = model.clusterCenters()

    def dist2(c) -> float:
        return sum((float(a) - float(b)) ** 2 for a, b in zip(c, query_vec))

    probe = sorted(range(len(centers)), key=lambda i: dist2(centers[i]))[:n_probe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("_cluster").isin(probe))
        .withColumn("cosine", cosine(vec_col, q))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
        .drop("_features", "_cluster")
    )


def topk_cosine_lsh(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: candidate = any LSH table agrees with the query's bucket;
    candidates are re-ranked by exact cosine. Recall grows with ``n_tables``
    and shrinks with ``n_planes``; (8 planes, 4 tables) targets ~50x scan
    reduction with usable recall on clustered data.
    """
    dim = len(query_vec)
    bucketed = with_lsh_bucket(embeddings, dim, n_planes, n_tables, seed, vec_col)
    # query buckets computed driver-side with the same planes (tiny, exact)
    qbuckets = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        packed = 0
        for p in planes:
            s = sum(float(a) * b for a, b in zip(query_vec, p))
            packed = packed * 2 + (1 if s > 0 else 0)
        qbuckets.append(packed)
    pred = F.lit(False)
    for t, qb in enumerate(qbuckets):
        pred = pred | (F.col(f"bucket_{t}") == qb)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.filter(pred)
        .withColumn("cosine", cosine(vec_col, q))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
        .drop(*[f"bucket_{t}" for t in range(n_tables)])
    )
