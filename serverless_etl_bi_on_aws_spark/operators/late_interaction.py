"""Late-interaction (MaxSim) retrieval over per-document token vectors
(north-star X3 extension, round 17).

Single-vector retrieval (operators/similarity.py: brute/LSH/IVF/PQ)
compresses a document to ONE embedding; late-interaction keeps a vector
PER TOKEN and scores

    score(q, d) = sum over query tokens qi of  max over doc tokens tj of
                  cosine(qi, tj)

— the ColBERT scoring rule (Khattab & Zaharia, SIGIR 2020), the standard
quality-over-speed point between bi-encoders and cross-encoders in
modern retrieval/RAG stacks. This module is the exact distributed
formulation:

  * the query's token vectors are PLAN LITERALS (a query has a handful
    of tokens; they inline like q6's probe vector — nothing joins,
    nothing broadcasts);
  * each corpus token row computes its |Q| cosines MAP-SIDE via the
    functions/vectors.py HOF fold (JVM, codegen'd scan — and
    bit-identical to DuckDB's ``list_cosine_similarity``, the q6/q44
    left-fold discipline);
  * one partial-aggregated groupBy on the document key takes the |Q|
    per-query maxima as |Q| unrolled ``max()`` aggregates in ONE hash
    aggregate (the simhash64 unrolling pattern — no explode of the
    query dimension crosses the exchange);
  * the MaxSim sum runs over EXACT micro-ints: each max scales through
    ``floor(m * 1e6 + 0.5)`` (monotonic, so post-max scaling equals
    pre-max scaling at 1/10^6 resolution) and the sum of BIGINTs is
    order-free — the engine-neutral-ranking discipline of q123/q124,
    avoiding the float-sum association knife-edge a 3-term double sum
    would reintroduce;
  * top-k is ``orderBy(...).limit(k)`` — Spark plans
    TakeOrderedAndProject, a per-partition heap + driver merge, never a
    global sort.

Scale shape at 100 TB: one scan of the token-vector table, one
doc-keyed exchange carrying |Q| doubles per document (NOT per token —
the partial agg collapses tokens map-side), then the heap top-k. The
candidate-generation step of a production ColBERT (ANN over token
vectors, then exact MaxSim on survivors) composes with the existing
IVF index: prune doc ids by probing per-query-token, then run this
exact scorer on the shortlist.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from serverless_etl_bi_on_aws_spark.functions.vectors import cosine


def maxsim_scores(
    doc_tokens: DataFrame,
    query_vecs: Sequence[Sequence[float]],
    id_col: str = "doc_id",
    vec_col: str = "vec",
    out_col: str = "score_micro",
) -> DataFrame:
    """Exact MaxSim score per document: ``(id_col, out_col)`` where
    ``out_col = sum_i floor(max_j cosine(q_i, t_j) * 1e6 + 0.5)`` as a
    BIGINT (micro-cosine units; range |Q| * [-1e6, 1e6]). One shuffle."""
    if not query_vecs:
        raise ValueError("query_vecs must be non-empty")
    aggs = [
        F.max(cosine(vec_col, F.lit([float(x) for x in q]))).alias(f"_m{i}")
        for i, q in enumerate(query_vecs)
    ]
    # NULL-vector rows carry no signal and a doc of ONLY NULL vectors
    # would otherwise ride a NULL score into the top-k ordering (r17
    # ADVICE): drop them before aggregating — the empty-shingle-doc rule,
    # vector-shaped. A NULL per-query maximum that SURVIVES the filter
    # (a dimension-mismatched vector against the query literal) is
    # malformed input and fails loudly instead of scoring NULL.
    g = doc_tokens.filter(F.col(vec_col).isNotNull()).groupBy(id_col).agg(*aggs)
    micro = F.lit(0).cast("bigint")
    ok = F.lit(True)
    for i in range(len(query_vecs)):
        ok = ok & F.col(f"_m{i}").isNotNull()
        micro = micro + F.floor(F.col(f"_m{i}") * 1e6 + F.lit(0.5)).cast(
            "bigint"
        )
    checked = F.when(ok, micro).otherwise(
        F.raise_error(
            F.concat(
                F.lit("maxsim: NULL cosine (malformed token vector) for "),
                F.col(id_col).cast("string"),
            )
        )
    )
    return g.select(id_col, checked.cast("bigint").alias(out_col))


def maxsim_topk(
    doc_tokens: DataFrame,
    query_vecs: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "doc_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Top-``k`` documents by exact MaxSim (ties break on the id — fully
    deterministic, engine-neutral). TakeOrderedAndProject plan.

    Malformed-input contract (inherited from :func:`maxsim_scores`, and
    where callers actually observe it — round-18 ADVICE): documents whose
    token vectors are ALL NULL are dropped before scoring, so they simply
    never appear in the top-``k``; any dimension-mismatched vector raises
    at execution time rather than silently scoring one doc wrong."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    scores = maxsim_scores(doc_tokens, query_vecs, id_col, vec_col)
    return scores.orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    ).limit(k)


def maxsim_topk_pruned(
    spark,
    doc_tokens: DataFrame,
    index_path: str,
    query_vecs: Sequence[Sequence[float]],
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    id_col: str = "doc_id",
    vec_col: str = "vec",
    token_id_col: str = "vec_id",
    index_vec_col: str = "embedding",
) -> DataFrame:
    """The 100 TB candidate-generation composition (the ColBERT/PLAID
    two-stage shape): per QUERY token, probe the persisted IVF index
    (operators/similarity.py — built over the SAME token vectors,
    ``token_id_col``-keyed) for its ``shortlist`` nearest token vectors;
    the union of the hit tokens' documents is the candidate set, and the
    exact :func:`maxsim_topk` scorer runs on only those documents'
    tokens (a left-semi join — no exact MaxSim pass over the full
    corpus).

    Recall is governed by ``n_probe`` x ``shortlist`` exactly like
    single-vector IVF: a document can only be missed if NONE of its
    tokens surface in any query token's shortlist (far weaker than the
    single-vector miss condition — any one strong token recalls the
    whole document). ``doc_tokens`` must carry ``token_id_col`` so hits
    map back to documents.

    Scale shape: |Q| partition-pruned index probes (each reads
    n_probe/n_clusters of the corpus files), one ids-only semi-join to
    scope the token table, then the exact scorer's single doc-keyed
    exchange over the shortlisted docs only."""
    from serverless_etl_bi_on_aws_spark.operators.similarity import (
        ivf_probe_topk,
    )

    if not query_vecs:
        raise ValueError("query_vecs must be non-empty")
    hit_tokens = None
    for q in query_vecs:
        hits = ivf_probe_topk(
            spark,
            index_path,
            [float(x) for x in q],
            k=shortlist,
            n_probe=n_probe,
            id_col=token_id_col,
            vec_col=index_vec_col,
        ).select(token_id_col)
        hit_tokens = hits if hit_tokens is None else hit_tokens.unionByName(hits)
    cand_docs = (
        doc_tokens.join(
            F.broadcast(hit_tokens.dropDuplicates([token_id_col])),
            token_id_col,
            "left_semi",
        )
        .select(id_col)
        .dropDuplicates([id_col])
    )
    pruned = doc_tokens.join(F.broadcast(cand_docs), id_col, "left_semi")
    return maxsim_topk(pruned, query_vecs, k=k, id_col=id_col, vec_col=vec_col)
