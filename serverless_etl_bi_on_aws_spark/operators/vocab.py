"""Corpus vocabulary construction + out-of-vocabulary statistics
(round 15) — the tokenizer-prep face of the text family: before
training a BPE merge table (functions/bpe.py) or fixing an embedding
vocabulary, a pipeline builds the top-K token list and measures what a
candidate vocabulary MISSES (per-document OOV rate, corpus OOV mass —
the coverage/size trade-off curve every tokenizer design sweeps).

Determinism: the cut is top-``k`` by (count DESC, token ASC) — a TOTAL
order, so the vocabulary is a pure function of the corpus and both
engines agree exactly (the bm25_topk cut discipline). OOV counts are
exact integers.

Scale shape: the build is one explode + one partial-aggregated groupBy
+ TakeOrderedAndProject (no global sort); OOV stats broadcast the
(tiny, K-row) vocabulary and pay one partial-agg groupBy on the doc id
— the BM25-postings cost shape shared by every token-level operator
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from serverless_etl_bi_on_aws_spark.functions.text import tokens


def build_vocab(
    df: DataFrame, text_col: str = "text", k: int = 10_000
) -> DataFrame:
    """The top-``k`` vocabulary: ``(token, cnt, rank)`` under the
    (count DESC, token ASC) total order, rank 1-based. One explode +
    partial-agg groupBy + TakeOrderedAndProject."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
    )
    from pyspark.sql import Window

    # rank over the already-cut K rows — the window touches k rows, not
    # the corpus (the cut above is the TakeOrderedAndProject)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return counts.withColumn("rank", F.row_number().over(w))


def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document coverage against ``vocab``: ``(id, n_tokens,
    n_oov)`` — exact integers; empty docs report (0, 0). The vocabulary
    broadcasts; the only exchange is the per-doc partial aggregate."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    marked = toks.join(
        F.broadcast(vocab.select("token", F.lit(1).alias("__in"))),
        "token",
        "left",
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum((F.col("__in").isNull()).cast("int")).cast("bigint").alias("n_oov"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
        )
    )


def oov_report(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_ppm_threshold: int = 100_000,
) -> DataFrame:
    """The corpus-level roll-up: total tokens, total OOV, corpus OOV
    ppm (exact integer: 1e6 * oov DIV tokens), and how many documents
    exceed ``oov_ppm_threshold`` (the re-tokenize/expand-vocab work
    list). One row."""
    per = oov_stats(df, vocab, text_col=text_col, id_col=id_col)
    flagged = (
        F.col("n_tokens") > 0
    ) & (F.col("n_oov") * 1_000_000 > F.col("n_tokens") * oov_ppm_threshold)
    return per.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_oov").cast("bigint").alias("total_oov"),
        F.expr("CAST(sum(n_oov) * 1000000 DIV greatest(sum(n_tokens), 1) AS BIGINT)").alias(
            "oov_ppm"
        ),
        F.sum(flagged.cast("int")).cast("bigint").alias("docs_over_threshold"),
    )
