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


def pairwise_topk_blocked(
    embeddings: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_rows: int = 4096,
) -> DataFrame:
    """Exact pairwise top-k similarity via broadcast + blocked matmul — the
    numpy scale path for q24's HOF formulation.

    Pattern: the (normalized) corpus matrix is broadcast once (the same
    fits-in-executor-memory contract as a broadcast join — embedding shards
    at 100 TB are chunked so each index shard fits); the distributed side
    streams through ``mapInPandas`` in Arrow batches, each batch doing ONE
    ``B @ M.T`` matmul and keeping its per-row top-k. A final global top-k
    merges candidates. Wall-clock is matmul-bound (BLAS), not per-element
    interpreted — at 2k x 64-d this is ~100x fewer Python/JVM ops than the
    pair-join HOF plan.

    Returns (id_1, id_2, cosine) with id_1 < id_2, global top-k pairs.
    """
    import numpy as np

    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype="int64")
    mat = np.array([r[1] for r in rows], dtype="float64")
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sc = embeddings.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat)
    per_row_k = min(k, len(ids) - 1)

    def blocks(it):
        import pandas as pd

        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in it:
            bm = np.array(pdf[vec_col].tolist(), dtype="float64")
            bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
            sims = bm @ all_mat.T  # one BLAS call per Arrow batch
            out_1, out_2, out_c = [], [], []
            for r, my_id in enumerate(pdf[id_col].tolist()):
                row = sims[r].copy()
                # enforce i<j BEFORE the per-row top-k so slots aren't wasted
                # on already-counted (j<i) or self pairs
                row[all_ids <= int(my_id)] = -np.inf
                kk = min(per_row_k, int((row > -np.inf).sum()))
                if kk <= 0:
                    continue
                idx = np.argpartition(row, -kk)[-kk:]
                for j in idx:
                    out_1.append(int(my_id))
                    out_2.append(int(all_ids[j]))
                    out_c.append(float(row[j]))
            yield pd.DataFrame({"id_1": out_1, "id_2": out_2, "_cos": out_c})

    cand = embeddings.select(id_col, vec_col).mapInPandas(
        blocks, schema="id_1 bigint, id_2 bigint, _cos double"
    )
    return (
        cand.orderBy(F.col("_cos").desc(), "id_1", "id_2")
        .limit(k)
        .select("id_1", "id_2", F.round("_cos", 6).alias("cosine"))
    )


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
