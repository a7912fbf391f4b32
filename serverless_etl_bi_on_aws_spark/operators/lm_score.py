"""N-gram language-model scoring — the CCNet/KenLM-style perplexity
filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020): train a smoothed LM on a
reference corpus, score every document by average token log-probability,
and gate on the score. The engine's rule-based signals (q15 ratios, q55
repetition) catch degenerate text; the LM score catches fluent-looking
text that doesn't match the reference distribution — the filter that
separated CCNet tiers.

Everything is DataFrame algebra (no Python in either phase):

  * :func:`train_bigram_lm` — ONE pass over the reference corpus:
    bigram + unigram counts (exact longs) plus the vocabulary size. At
    100 TB the reference corpus is a curated sample (Wikipedia-sized,
    not crawl-sized); the LM table is vocabulary²-bounded and in
    practice far smaller (observed bigrams only).
  * :func:`score_documents` — explode each document's bigrams once,
    ONE equi join against the LM table (broadcast when the LM fits,
    AQE decides), add-one-smoothed conditional probability
    ``(c(w1 w2) + 1) / (c(w1) + V)`` (unseen bigrams fall back to the
    same formula with c=0 — fully defined, no backoff table), aggregate
    ``avg(ln p)`` per doc. Exact token/OOV counts ride along; the float
    is a single ln() per DISTINCT (bigram, smoothing) pair summed once
    per occurrence — engine-reproducible to double noise.

Gate: ``score >= threshold`` (or per-language threshold bands, the
CCNet head/middle/tail split) — a map-only filter over the scored scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bigrams(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """EVERY bigram occurrence (not distinct — LM counts are frequencies;
    functions.text.shingles_from_tokens dedups for the dedup family).
    Token array materialized in its own select (interpreted-HOF rule)."""
    toks = df.select(*id_cols, F.split(F.col(text_col), " ").alias("__t"))
    grams = F.when(
        F.size("__t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__t") - 1),
            lambda i: F.concat_ws(" ", F.slice("__t", i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select(*id_cols, F.explode(grams).alias("bigram"))


def train_bigram_lm(
    reference: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """One pass over the reference corpus → (bigram counts, unigram
    counts, vocabulary size). Counts are exact longs."""
    grams = _bigrams(reference, [], text_col)
    bigram_counts = grams.groupBy("bigram").agg(F.count("*").alias("c2"))
    unis = reference.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    unigram_counts = unis.groupBy("w").agg(F.count("*").alias("c1"))
    vocab_size = unigram_counts.count()
    return bigram_counts, unigram_counts, vocab_size


def score_documents(
    docs: DataFrame,
    bigram_counts: DataFrame,
    unigram_counts: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: ``n_bigrams`` (exact), ``n_unseen`` (exact — bigrams
    absent from the LM), and ``avg_logprob`` (add-one-smoothed bigram
    model). Higher is more reference-like; CCNet gates on exactly this
    quantity (as perplexity, a monotone transform)."""
    grams = _bigrams(docs, [id_col], text_col).withColumn(
        "w1", F.split(F.col("bigram"), " ").getItem(0)
    )
    joined = (
        grams.join(bigram_counts, "bigram", "left")
        .join(unigram_counts, grams.w1 == unigram_counts.w, "left")
        .select(
            id_col,
            F.coalesce("c2", F.lit(0)).alias("c2"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
        )
    )
    logp = F.log(
        (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.lit(float(vocab_size)))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum((F.col("c2") == 0).cast("long")).alias("n_unseen"),
            F.avg(logp).alias("avg_logprob"),
        )
    )


def filter_by_lm_score(
    docs: DataFrame,
    bigram_counts: DataFrame,
    unigram_counts: DataFrame,
    vocab_size: int,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    unscored: str = "drop",
) -> DataFrame:
    """Keep documents whose avg token log-prob clears ``threshold`` —
    the perplexity gate (ln-space).

    Documents with fewer than 2 tokens produce no bigrams and therefore
    no score; ``unscored`` sets their fate EXPLICITLY instead of the gate
    silently deleting them regardless of threshold (the pre-round-8
    behavior, which made the quality filter double as an undocumented
    min-length filter):

    - ``"drop"`` (default — matches the published CCNet pipeline, where
      sub-bigram fragments are never trainable documents anyway),
    - ``"keep"`` — pass them through un-gated (an upstream length filter
      owns that policy instead).
    """
    if unscored not in ("drop", "keep"):
        raise ValueError(f"unscored must be 'drop' or 'keep', got {unscored!r}")
    scored = score_documents(
        docs, bigram_counts, unigram_counts, vocab_size, id_col, text_col
    )
    passed = docs.join(
        scored.filter(F.col("avg_logprob") >= threshold).select(id_col),
        id_col,
        "left_semi",
    )
    if unscored == "drop":
        return passed
    # keep: anti-join against the SCORED set (not the passed set) — a doc
    # absent from `scored` has no bigrams at all; both joins are on the
    # same shuffle key so AQE reuses the exchange.
    no_score = docs.join(scored.select(id_col), id_col, "left_anti")
    return passed.unionByName(no_score)
