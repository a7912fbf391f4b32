"""Semantic-dedup A/B: cluster-pruned tiling vs exact all-pairs (round 10).

The structural claim in operators/semantic_dedup.py is that k-means
pruning turns the pair search from O(B^2) matmul tiles over the whole
corpus into a per-cluster tiling whose total work is linear in N once
cluster count scales with the corpus. The fixture corpora are too small
for the quadratic term to dominate (sf0.1 = 2000 vectors = ONE 2048-row
block — the exact path is a single tile), so this script measures on a
REPLICATED corpus where the block count is real:

  corpus  = sf0.1 embeddings x REP copies (ids offset per copy; each
            copy's vectors perturbed by a copy-keyed deterministic
            nudge so replicas are near- but not exactly identical)
  exact   = neardup_cosine_pairs: B = ceil(N/2048) blocks ->
            B(B+1)/2 tiles, each one BLAS matmul
  pruned  = semantic_neardup_pairs over a k-cluster assignment:
            sum_c Bc(Bc+1)/2 tiles with Bc = ceil(Nc/2048)

Both paths share _block_operands and the same kernel body, so the
wall-clock difference isolates the tiling. The pruned path's found-pair
count is reported next to the exact count — the recall trade is the
point, not a defect; q80 gates it.

Measured (this container, local[32], 2026-08-14, best-of-3 per cell,
one warm session per config; dim 64, k = 4*REP so target cluster size
stays constant as the corpus grows — the deployment rule):

  REP=16, N=32k  (16 blocks -> 136 exact tiles vs 64 pruned):
    t=0.9 (near-dup regime): exact 1.79 s / pruned 1.26 s = 1.42x;
          pairs 240,000 vs 240,000 — 100.00% capture: every planted
          replica pair co-clusters, the SemDeDup premise verified
    t=0.4 (moderate-sim):     exact 1.71 s / pruned 1.24 s = 1.38x;
          capture 63.25% — kmeans separates weakly-similar pairs,
          the documented trade (q80 gates the floor)
  REP=48, N=96k  (47 blocks -> 1128 exact tiles vs 192 pruned):
    t=0.9: exact 4.97 s / pruned 1.39 s = 3.57x; capture 100.00%
    t=0.4: exact 5.14 s / pruned 1.53 s = 3.36x; capture 64.30%

The asymptote is visible in the growth rates: tripling N grew the
pruned wall 1.26 -> 1.39 s (~linear, tiles 64 -> 192) while the exact
wall grew 1.79 -> 4.97 s (tiles 136 -> 1128, quadratic); at fixture
sizes the per-tile fixed cost (~10 ms of task + Arrow group overhead)
still cushions the exact path, so the wall ratio trails the tile
ratio and widens with N. Near-dup capture is exactly 100% at both
sizes; the moderate-similarity capture (~63-64%) is flat in N.

Run: PYTHONPATH=/root/repo python tools/ab_semantic_tiles.py [REP] [THRESHOLD]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.semantic_dedup import (
    cluster_assignments,
    semantic_neardup_pairs,
)
from serverless_etl_bi_on_aws_spark.operators.similarity import (
    neardup_cosine_pairs,
)
from serverless_etl_bi_on_aws_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
THRESHOLD = 0.4  # overridable via argv[2]
BLOCK_ROWS = 2048


def replicated_corpus(spark, rep: int):
    """rep near-copies of the sf0.1 embeddings: ids offset per copy,
    each copy's vectors nudged by a deterministic per-copy epsilon on
    one dimension (element_at+transform keeps it JVM-side)."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    copies = spark.range(rep).withColumnRenamed("id", "_copy")
    return (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("_copy") * 1_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> CAST(x + (CASE WHEN i = 0 "
                "THEN _copy * 0.001 ELSE 0.0 END) AS float))"
            ).alias("embedding"),
        )
    )


def best_of(fn, n=3):
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else THRESHOLD
    spark = get_spark(app_name="ab-semantic-tiles")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = replicated_corpus(spark, rep).localCheckpoint(eager=True)
    n = corpus.count()
    n_clusters = 4 * rep  # constant target cluster size as rep grows
    asg = cluster_assignments(corpus, n_clusters=n_clusters, seed=42).localCheckpoint(
        eager=True
    )

    import math

    b = math.ceil(n / BLOCK_ROWS)
    exact_tiles = b * (b + 1) // 2
    sizes = [r["n"] for r in asg.groupBy("_cluster").agg(F.count("*").alias("n")).collect()]
    pruned_tiles = sum(
        (math.ceil(s / BLOCK_ROWS) * (math.ceil(s / BLOCK_ROWS) + 1)) // 2
        for s in sizes
    )
    print(f"N={n} blocks={b} exact_tiles={exact_tiles} "
          f"clusters={len(sizes)} pruned_tiles={pruned_tiles} "
          f"max_cluster={max(sizes)}")

    t_exact, n_exact = best_of(
        lambda: neardup_cosine_pairs(
            corpus, threshold, block_rows=BLOCK_ROWS
        ).count()
    )
    t_pruned, n_pruned = best_of(
        lambda: semantic_neardup_pairs(
            corpus, threshold, assignments=asg, block_rows=BLOCK_ROWS
        ).count()
    )
    print(f"exact : {t_exact:6.2f} s  pairs={n_exact}")
    print(f"pruned: {t_pruned:6.2f} s  pairs={n_pruned} "
          f"({100.0 * n_pruned / max(n_exact, 1):.2f}% of exact)")
    print(f"wall ratio {t_exact / max(t_pruned, 1e-9):.2f}x  "
          f"tile ratio {exact_tiles / max(pruned_tiles, 1):.2f}x")


if __name__ == "__main__":
    main()
