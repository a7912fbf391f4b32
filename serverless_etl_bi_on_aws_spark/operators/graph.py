"""Link graph construction + exact fixed-point PageRank.

Crawl-corpus curation uses link-graph centrality as a document-quality
prior (Common Crawl itself ships harmonic-centrality host ranks; OPIC /
PageRank variants gate what gets crawled at all) — so the engine that
ingests WARC segments (sources/warc.py) and extracts main text + outlinks
(functions/html.py) also needs the step that turns those outlinks into a
graph and ranks it. The reference's BI story stops at relational joins
(README.md:100-101); this module is part of the training-data-pipeline
extension surface (SURVEY §2 X-rows).

Two deliberate design decisions, both for 100 TB replayability:

1. **Exact integer arithmetic.** Ranks are parts-per-million BIGINTs and
   every update is ``r'(v) = (1000000 - d_ppm) + d_ppm * contrib(v) DIV
   1000000`` with ``contrib(v) = sum over in-edges (u,v) of r(u) DIV
   outdeg(u)`` — integer division throughout, no floats anywhere. Sums of
   integers are order-independent, so the result is bit-identical across
   partitionings, retries, and engines (the DuckDB oracle unrolls the
   same recurrence and matches exactly). Float PageRank differs in the
   last bits per shuffle layout — unacceptable for a replayable corpus
   snapshot gate.
2. **Fixed iteration count, dangling mass dropped.** A fixed ``n_iter``
   (not convergence-tested) keeps the plan static and the oracle
   closed-form; dangling nodes (no outlinks) simply do not redistribute
   — the standard "remove dangling mass" simplification, documented here
   as the operator's contract. Ranks are therefore a quality SIGNAL
   (ordering, thresholds), not a probability distribution.

Scale shape: node set + outdegree are computed once and cached; each
iteration is one shuffle-join of ranks onto edges (hash on ``src``) and
one groupBy(``dst``) partial-aggregated sum — the canonical distributed
PageRank step. Edges are repartitioned by ``src`` ONCE up front so every
iteration's join reuses the same partitioning; ``localCheckpoint`` cuts
the growing lineage per iteration (the components.py lesson). For graphs
whose edge list dwarfs memory, the same loop runs off a parquet-persisted
edge table — nothing here holds edges on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: default damping factor, parts-per-million (0.85)
DAMPING_PPM = 850_000
#: initial rank, parts-per-million of one unit per node
INIT_RANK_PPM = 1_000_000


def extract_link_edges(
    docs: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    drop_self_loops: bool = True,
) -> DataFrame:
    """``(src, dst)`` DISTINCT edge list from a corpus of HTML pages.

    ``src`` is the page's own URL, ``dst`` each outlink extracted by
    :func:`functions.html.extract_links` (skip-subtree-aware, fragment-
    stripped, relative hrefs resolved against ``src``). Self-loops are
    dropped by default (a page linking to itself carries no ranking
    information and breaks the aperiodicity story).

    Map-only until the single ``distinct`` exchange; bodies are pruned
    before it (the exchange moves only (src, dst) string pairs).
    """
    from serverless_etl_bi_on_aws_spark.functions.html import extract_links

    edges = (
        docs.select(
            F.col(url_col).alias("src"),
            F.explode(extract_links(html_col, url_col)).alias("dst"),
        )
    )
    if drop_self_loops:
        edges = edges.filter(F.col("src") != F.col("dst"))
    return edges.distinct()


def pagerank_fixedpoint(
    edges: DataFrame,
    n_iter: int = 3,
    damping_ppm: int = DAMPING_PPM,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact fixed-point PageRank over a directed edge list.

    Returns ``(node, rank_ppm)`` for every node appearing as src OR dst,
    with the integer recurrence documented in the module docstring.
    Deterministic and engine-reproducible: the q99 oracle unrolls the
    same ``n_iter`` steps in SQL and matches bit-for-bit.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 <= damping_ppm <= 1_000_000:
        raise ValueError(f"damping_ppm must be in [0, 1e6], got {damping_ppm}")

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # partition edges by src ONCE; every iteration's rank join reuses it
    e = e.repartition("src").localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))

    base_ppm = 1_000_000 - damping_ppm
    ranks = nodes.select("node", F.lit(INIT_RANK_PPM).cast("bigint").alias("rank_ppm"))
    for i in range(n_iter):
        contrib = (
            e.join(outdeg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_ppm DIV outdeg").alias("share"),
            )
            .groupBy("node")
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base_ppm)
                + F.expr(
                    f"CAST({damping_ppm} AS BIGINT) * coalesce(contrib, 0) DIV 1000000"
                )
            ).cast("bigint").alias("rank_ppm"),
        )
        # Round-18 optimization: checkpoint every 4th iteration and the
        # final result instead of every iteration. The chain is linear
        # (each iteration consumed exactly once by the next), so the
        # per-iteration materialization bought nothing at small n_iter
        # but paid a job launch + RDD round-trip per step — measured on
        # q99 (3 iterations): 2.75 -> 1.88 s, identical ranks. Periodic
        # truncation keeps the plan bounded for large n_iter; the final
        # checkpoint keeps the returned frame cheap for its multiple
        # consumers (top-k + audit branches).
        if i == n_iter - 1 or (i + 1) % 4 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def rank_column(
    docs: DataFrame,
    ranks: DataFrame,
    url_col: str = "url",
    out_col: str = "rank_ppm",
    default_ppm: int | None = None,
) -> DataFrame:
    """Attach ``rank_ppm`` to a corpus by URL (left join; pages absent
    from the graph get ``default_ppm``, which defaults to the rank of an
    unlinked node: ``1000000 - damping``). The graph is typically tiny
    relative to the corpus bodies — Spark broadcasts it under AQE; at
    host-graph scale it is a plain hash join on the url key."""
    if default_ppm is None:
        default_ppm = 1_000_000 - DAMPING_PPM
    r = ranks.withColumnRenamed("node", url_col).withColumnRenamed(
        "rank_ppm", out_col
    )
    return docs.join(r, url_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(default_ppm).cast("bigint"))
    )
