"""Document chunking — fixed-size token windows with overlap.

The step every LLM training/RAG pipeline runs between cleaning and
tokenizer/embedding: split each document into chunks of ``chunk_tokens``
tokens advancing by ``stride`` (overlap = chunk_tokens - stride). Not in the
reference (its text handling stops at the funnel ETL), mandated by the
north-star extension surface (X5/X6).

Fast path is pure JVM column algebra — ``split`` once, ``sequence`` of chunk
starts, ``explode``, ``slice`` — no Python in the row loop, so it chunks at
scan speed and whole-stage codegen keeps it fused. The tokens array is
materialized in its own projection first (HOF/alias re-evaluation pitfall —
see functions/text.py). A Python UDTF twin lives in functions/udtf_fns.py to
exercise Spark 4's UDTF surface; tests pin their equality.

Scale: output is a narrow per-chunk row (ids + hash), ~n_tokens/stride rows
per doc with no shuffle at all — chunking 100 TB is a map-only stage that
AQE never has to think about.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    chunk_tokens: int = 50,
    stride: int = 40,
    keep_text: bool = False,
) -> DataFrame:
    """Explode each document into overlapping token chunks.

    Output columns: ``*id_cols, chunk_id, n_tokens_chunk, chunk_md5``
    (+ ``chunk_text`` when ``keep_text``). ``chunk_id`` is the 0-based
    window index (``start div stride``); the final chunk may be short
    (slice clamps at the document end). Tokenization is a literal
    single-space split — swap ``text_col`` for a pre-tokenized array
    column upstream for anything smarter.
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    tok = df.select(
        *id_cols,
        F.split(F.col(text_col), " ").alias("__tokens"),
    ).withColumn("__n", F.size("__tokens"))
    exploded = tok.select(
        *id_cols,
        "__tokens",
        "__n",
        F.explode(
            F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
        ).alias("__start"),
    )
    chunk: Column = F.slice("__tokens", F.col("__start") + 1, chunk_tokens)
    cols = [
        *id_cols,
        F.expr(f"__start div {stride}").alias("chunk_id"),
        F.least(F.lit(chunk_tokens), F.col("__n") - F.col("__start"))
        .cast("long")
        .alias("n_tokens_chunk"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    ]
    if keep_text:
        cols.append(F.concat_ws(" ", chunk).alias("chunk_text"))
    return exploded.select(*cols)
