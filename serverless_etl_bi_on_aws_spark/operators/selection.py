"""DSIR-style data selection — importance weighting toward a TARGET
distribution (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): given a small high-quality target corpus (wiki,
books, curated) and the raw crawl, score every raw document by how much
more likely its hashed n-gram profile is under the target distribution
than under the raw distribution, then keep the top of the ranking (or
hash-Bernoulli sample proportionally). This is the SELECTION complement
of the engine's quality family: gopher rules and the quality classifier
judge a document in isolation; DSIR judges it against what you want the
mixture to look like.

Shape (all three phases bounded or map-reduce — nothing corpus-sized on
the driver):

  * :func:`fit_dsir_weights` — hashed unigram counts over BOUNDED
    samples of target and raw (the lang-ID/IVF bounded-fit discipline:
    ``sample(frac).limit(rows)`` — fit cost independent of corpus
    size), add-one smoothing, per-bucket integer weight
    ``w_milli = round(1000 * (ln p_target(b) - ln p_raw(b)))``.
    The output is a ``num_buckets``-row weights table (64k rows ~ 1 MB
    — broadcastable) materialized ONCE; the log runs only here.
  * :func:`dsir_score` — per-document importance score in exact BIGINT
    milli-nats: explode tokens -> xxhash64 bucket -> broadcast-join the
    weights -> one partial-aggregated sum per doc. Integer sums, so a
    score is bit-identical across partitionings and replays (the log
    floats were frozen into the weights table at fit time).
  * :func:`dsir_select_top` — the deterministic variant: keep the
    ``k`` best documents under the (score desc, id asc) TOTAL order.
    :func:`dsir_sample` — the paper's resampling variant, derandomized
    the engine's standard way: accept doc iff
    ``pmod(xxhash64(id, seed), 1_000_000) < p_ppm(score)`` with a
    logistic acceptance curve — replay-stable, no RNG state.

Scale: the explode is the corpus's token stream (the same cost BM25
postings pay), the weights join broadcasts, and the per-doc sum is one
partial-agg shuffle on the id. Verification: the weights come from
logs, so the q117 gate is planted-margin (q13/q18 discipline) — the
plant separates target-like from raw-like documents by construction,
the oracle states membership verdicts and exact counts closed-form,
and the bounded-fit trap is pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from serverless_etl_bi_on_aws_spark.functions.text import tokens


def _bucket_counts(
    df: DataFrame, text_col: str, num_buckets: int, fit_sample_rows: int, seed: int
) -> DataFrame:
    """Bounded-sample hashed unigram counts: (bucket, cnt)."""
    sample = df.select(text_col).filter(F.col(text_col).isNotNull())
    n_rows = sample.count()
    frac = min(1.0, (float(fit_sample_rows) * 1.2) / max(n_rows, 1))
    if frac < 1.0:
        sample = sample.sample(fraction=frac, seed=seed)
    sample = sample.limit(int(fit_sample_rows))
    toks = sample.select(F.explode(tokens(text_col)).alias("tok")).filter(
        F.col("tok") != ""
    )
    return (
        toks.select(F.pmod(F.xxhash64("tok"), F.lit(num_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def fit_dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    num_buckets: int = 1 << 16,
    fit_sample_rows: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """The per-bucket importance weights table
    ``(bucket, w_milli)`` — w_milli = round(1000 * log-likelihood-ratio)
    with add-one smoothing on both sides (an unseen bucket is penalized,
    never infinite). Materialize (cache or write) before scoring a large
    corpus so the fit logs run exactly once."""
    t = _bucket_counts(target, text_col, num_buckets, fit_sample_rows, seed)
    r = _bucket_counts(raw, text_col, num_buckets, fit_sample_rows, seed + 1)
    t_tot = t.agg(F.sum("cnt")).first()[0] or 0
    r_tot = r.agg(F.sum("cnt")).first()[0] or 0
    if t_tot == 0 or r_tot == 0:
        raise ValueError("empty target or raw sample — nothing to fit")
    buckets = target.sparkSession.range(num_buckets).select(
        F.col("id").alias("bucket")
    )
    joined = (
        buckets.join(t.withColumnRenamed("cnt", "t_cnt"), "bucket", "left")
        .join(r.withColumnRenamed("cnt", "r_cnt"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
    )
    log_t = F.log((F.col("t_cnt") + 1).cast("double") / F.lit(float(t_tot + num_buckets)))
    log_r = F.log((F.col("r_cnt") + 1).cast("double") / F.lit(float(r_tot + num_buckets)))
    return joined.select(
        "bucket",
        F.round((log_t - log_r) * 1000).cast("bigint").alias("w_milli"),
    )


def weights_num_buckets(weights: DataFrame) -> int:
    """The validated bucket-space size of a weights table:
    ``max(bucket) + 1``, asserted DENSE (``count == max+1``) in one
    aggregation job. :func:`fit_dsir_weights` always emits the dense
    table (one row per bucket, zeros included); a filtered or compacted
    table (e.g. non-zero rows only) would silently re-modulo every
    token into the wrong bucket space, so it fails loudly here instead.
    Callers on a hot path (streaming micro-batches) should compute this
    ONCE per weights table and pass ``num_buckets=`` through."""
    row = weights.agg(
        F.count(F.lit(1)).alias("n"), F.max("bucket").alias("m")
    ).first()
    n, m = row["n"], row["m"]
    if n == 0 or m is None:
        raise ValueError("empty DSIR weights table")
    if n != m + 1:
        raise ValueError(
            f"DSIR weights table is not dense: {n} rows but max bucket {m} "
            f"(expected {m + 1} rows) — pass the full table from "
            "fit_dsir_weights, not a filtered/compacted subset"
        )
    return int(m) + 1


def dsir_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "dsir_milli",
    num_buckets: int | None = None,
) -> DataFrame:
    """Append the per-document importance score (BIGINT milli-nats):
    sum of the doc's per-token bucket weights. Exact integer arithmetic
    once the weights exist, so scores are replay/partitioning-stable.
    Empty/whitespace docs score 0. ``num_buckets`` (the modulus of the
    token hash) defaults to :func:`weights_num_buckets`'s validated
    derivation — one extra aggregation job; per-micro-batch callers
    should derive it once and pass it."""
    if num_buckets is None:
        num_buckets = weights_num_buckets(weights)
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).filter(F.col("tok") != "")
    per_doc = (
        toks.select(
            id_col, F.pmod(F.xxhash64("tok"), F.lit(num_buckets)).alias("bucket")
        )
        .join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum("w_milli").alias(out_col))
    )
    return df.join(per_doc, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0)).cast("bigint")
    )


def dsir_select_top(
    df: DataFrame,
    weights: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> DataFrame:
    """The deterministic selection: the ``k`` documents with the highest
    importance scores under the (score desc, id asc) total order — the
    cut is a pure function of the data (same contract as bm25_topk's
    cut). NO global sort of the corpus: a rank window partitioned on a
    constant would be one, so this uses the same TakeOrderedAndProject
    shape as every top-k in the engine via orderBy().limit()."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    scored = dsir_score(
        df, weights, text_col=text_col, id_col=id_col, num_buckets=num_buckets
    )
    return scored.orderBy(
        F.col("dsir_milli").desc(), F.col(id_col)
    ).limit(k)


def dsir_sample(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    midpoint_milli: int = 0,
    scale_milli: int = 1000,
    seed: int = 0,
    num_buckets: int | None = None,
) -> DataFrame:
    """The resampling variant, derandomized: accept document ``d`` iff
    ``pmod(xxhash64(id, seed), 1e6) < p_ppm(score)`` where p follows the
    logistic curve ``1 / (1 + exp(-(score - midpoint)/scale))`` — docs
    far above the midpoint are near-certain keeps, far below near-
    certain drops, and the decision is a pure function of (id, seed,
    weights), so replays and engines agree on membership given the same
    weights table. The logistic runs in double only to derive the
    per-row integer threshold; the accept comparison is integer."""
    scored = dsir_score(
        df, weights, text_col=text_col, id_col=id_col, num_buckets=num_buckets
    )
    z = (F.col("dsir_milli") - F.lit(midpoint_milli)).cast("double") / F.lit(
        float(scale_milli)
    )
    p_ppm = (F.lit(1_000_000.0) / (F.lit(1.0) + F.exp(-z))).cast("bigint")
    u = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    return scored.filter(u < p_ppm)
