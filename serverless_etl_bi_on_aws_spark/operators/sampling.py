"""Dataset splitting & sampling for training-data pipelines.

Not in the reference (its sampling is "look at it in QuickSight"), but any
LLM-data pipeline over this engine needs (a) a train/val/test assignment
that is *deterministic and cluster-stable* — the same row lands in the same
split on every run, every executor count, every engine — and (b) per-stratum
downsampling (e.g. cap each language/source at a fraction).

randomSplit() is NOT run-stable (partition-order dependent); the standard
fix is hashing a stable id into buckets. We use a Knuth multiplicative hash
(id * 2654435761 mod 100) — exact integer arithmetic any engine reproduces
(the DuckDB oracle runs the same formula), no murmur3 dependency. At 100 TB
it's a narrow projection: no shuffle, no state, pushes through AQE untouched.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Knuth's multiplicative constant (2^32 / golden ratio), prime-ish mixer.
_MIX = 2654435761


def split_bucket(id_col: str | Column, n_buckets: int = 100) -> Column:
    """Stable pseudo-random bucket in [0, n_buckets) from an integer id."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(col * F.lit(_MIX), F.lit(n_buckets))


def _split_expr(bucket: Column, cut_points: Mapping[str, int] | None) -> Column:
    """CASE expression mapping a [0, 100) bucket to split names: each cut is
    an exclusive upper percentile bound, checked ascending; the remainder is
    "test"."""
    cuts = dict(cut_points) if cut_points is not None else {"train": 80, "val": 90}
    expr: Column | None = None
    for name, bound in sorted(cuts.items(), key=lambda kv: kv[1]):
        expr = (
            F.when(bucket < bound, name)
            if expr is None
            else expr.when(bucket < bound, name)
        )
    return F.lit("test") if expr is None else expr.otherwise("test")


def deterministic_split(
    df: DataFrame,
    id_col: str,
    cut_points: Mapping[str, int] | None = None,
) -> DataFrame:
    """Add a ``split`` column ("train"/"val"/"test" by default: 80/10/10).

    ``cut_points`` maps split name -> exclusive upper percentile bound,
    checked in ascending order; the last split takes the remainder.
    """
    return df.withColumn("split", _split_expr(split_bucket(id_col), cut_points))


def cluster_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    cut_points: Mapping[str, int] | None = None,
    id1_col: str = "id_1",
    id2_col: str = "id_2",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every near-dup CLUSTER lands
    wholly in one split.

    :func:`deterministic_split` hashes the ROW id, so two near-duplicate
    documents (same article under different chrome, a paraphrase, a crop of
    the same image) can straddle train and test — the classic train/test
    contamination path that inflates eval numbers. The fix corpus pipelines
    ship is to split on the DEDUP-CLUSTER key instead: connected components
    over the near-dup pair graph (operators/components.py) give every row a
    cluster label (the minimum reachable id; rows in no pair are their own
    singleton cluster), and the multiplicative-hash bucket is computed on
    that label — so all members of a transitive near-dup cluster share one
    bucket, hence one split, by construction.

    Adds two columns: ``split_key`` (the cluster label the hash ran on,
    bigint) and ``split``. Rows in no pair get ``split_key = id``, making
    the assignment IDENTICAL to :func:`deterministic_split` outside the
    clustered minority — upgrading an existing id-hash split to the
    cluster-safe one only moves rows that were contaminated.

    Scale shape: components is iterative join/groupBy on the PAIR graph
    only (near-dup pairs are a small fraction of the corpus); the join back
    onto ``df`` is one equi-join on the id (labels frame is pair-node-sized,
    typically broadcastable — AQE decides), then the same narrow map-only
    hash projection as deterministic_split. Deterministic across runs,
    partitionings, executor counts, and engines (the DuckDB oracle
    recomputes components via recursive CTE and applies the same integer
    hash)."""
    import uuid

    from serverless_etl_bi_on_aws_spark.operators.components import (
        connected_components,
    )

    # nonce-suffixed working names: an input legitimately owning a
    # __cs_* column must survive untouched (the maintenance.py lesson)
    nonce = uuid.uuid4().hex[:8]
    c_id, c_comp = f"__cs_id_{nonce}", f"__cs_comp_{nonce}"
    comp = connected_components(pairs, id1_col, id2_col).select(
        F.col("id").alias(c_id), F.col("comp").alias(c_comp)
    )
    labeled = df.join(comp, df[id_col] == F.col(c_id), "left").drop(c_id)
    key = F.coalesce(F.col(c_comp), F.col(id_col).cast("bigint"))
    return (
        labeled.withColumn("split_key", key)
        .withColumn("split", _split_expr(split_bucket(key), cut_points))
        .drop(c_comp)
    )


def weighted_mix_sample(
    df: DataFrame,
    strata_col: str,
    weight: Column,
    id_col: str,
    k: int = 10000,
) -> DataFrame:
    """Target-weighted corpus mixing (the operator LLM pipelines actually
    run; uniform mix is the degenerate all-weights-equal case): downsample
    each stratum so realized sizes are proportional to ``weight`` (a Column
    over the stratum — positive integers), scaled as large as the scarcest
    stratum allows.

    Exact integer arithmetic, no floats: the feasible per-stratum keep
    threshold is

        thresh_s = min_t floor(k * w_s * cnt_t / (cnt_s * w_t))

    (the bottleneck stratum t pins the total; floor commutes with min, so
    taking the min of per-pair floors IS the floored optimum), and a row is
    kept iff ``split_bucket(id, k) < thresh_s`` — the same multiplicative-
    hash selection as :func:`deterministic_split`, deterministic across
    runs, partitionings, and engines.

    Scale shape: one tiny groupBy for per-stratum counts, a strata x strata
    threshold frame (squared in the number of STRATA — tens, never data-
    sized), one broadcast join back onto the scan, then a map-only filter.
    The sampled output never shuffles.

    Overflow: candidates are computed in DECIMAL(38,0) — the round-7
    bigint formulation ``k * _w * _cnt_t DIV (...)`` silently wrapped in
    non-ANSI mode once k*w*cnt passed 2^63 (~1e5 rows/stratum at
    temperature weights), yielding WRONG thresholds. The numerator is
    first clamped to ``k * den`` (sound: the min always includes the
    t == s candidate, which is exactly k, so any candidate above k can
    never win), keeping every quotient <= k; the floor division is the
    exact ``(n - n % d) / d`` — a subtract-remainder-then-divide of an
    exactly divisible value, no rounding anywhere. Bound: w and cnt each
    fit a long and k*w*cnt <= ~1e34 << 1e38."""
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_cnt")).select(
        strata_col, "_cnt", weight.cast("bigint").alias("_w")
    )
    other = counts.select(
        F.col("_cnt").alias("_cnt_t"), F.col("_w").alias("_w_t")
    )
    num = f"CAST({k} AS DECIMAL(38,0)) * _w * _cnt_t"
    den = "CAST(_cnt AS DECIMAL(38,0)) * _w_t"
    numc = f"LEAST({num}, CAST({k} AS DECIMAL(38,0)) * ({den}))"
    cand = f"CAST((({numc}) - (({numc}) % ({den}))) / ({den}) AS BIGINT)"
    thresholds = (
        counts.crossJoin(F.broadcast(other))
        .select(strata_col, F.expr(cand).alias("_cand"))
        .groupBy(strata_col)
        .agg(F.min("_cand").alias("_thresh"))
    )
    return (
        df.join(F.broadcast(thresholds), strata_col)
        .filter(split_bucket(id_col, k) < F.col("_thresh"))
        .drop("_thresh")
    )


def epoch_mix_repeat(
    df: DataFrame,
    strata_col: str,
    epochs: Mapping[str, float],
    id_col: str,
    default_epochs: float = 1.0,
) -> DataFrame:
    """Fractional-epoch UPsampling — the other half of corpus mixing
    (weighted_mix_sample only ever downsamples): materialize each
    stratum ``f`` times, e.g. 2.5 epochs of a curated source against one
    epoch of crawl (the published recipes repeat Wikipedia/books multiple
    epochs). Adds ``copy_idx`` (0-based) so downstream shard shuffling
    can spread the copies.

    Exact semantics, engine-reproducible: ``f`` is snapped to
    ``r = round(f * 10000)`` per-ten-thousandths; every row gets
    ``r // 10000`` copies, plus one more iff its multiplicative-hash
    bucket (mod 10000) is below ``r % 10000`` — so realized counts hit
    the target fraction exactly in expectation AND deterministically per
    row (same row, same copies, every run, every engine; the DuckDB
    oracle replays the rule). ``epochs`` of 0 drops the stratum;
    strata absent from the mapping get ``default_epochs``.

    Scale shape: the per-stratum factor is a literal CASE chain (strata
    are tens — no join, no shuffle, map-only); the repeat is one
    ``explode(sequence(...))`` whose output size IS the target corpus
    size. Nothing collects; partitioning is preserved."""
    factor: Column | None = None
    col = F.col(strata_col)
    for name, f in epochs.items():
        if f < 0:
            raise ValueError(f"epochs must be >= 0 (got {f!r} for {name!r})")
        r = F.lit(int(round(f * 10000)))
        factor = F.when(col == name, r) if factor is None else factor.when(
            col == name, r
        )
    default_r = F.lit(int(round(default_epochs * 10000)))
    factor = default_r if factor is None else factor.otherwise(default_r)
    n = F.floor(factor / 10000).cast("long") + (
        split_bucket(id_col, 10000) < F.pmod(factor, F.lit(10000))
    ).cast("long")
    return (
        df.withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    seed: int = 7,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`sampleBy`): cap over-represented
    strata (languages, sources) at a fraction. Seeded, but only
    *statistically* reproducible — for exact reproducibility across engines
    use deterministic_split-style bucketing on an id instead."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """EXACTLY ``min(k, |stratum|)`` rows per stratum (round 16 — the
    eval-set constructor: "k docs per language/source, the same k docs
    every run, every engine"): rows rank under the total order
    (multiplicative-hash(id + seed), id) within each stratum and the
    top ``k`` survive. Deterministic and replayable by construction —
    the DuckDB oracle reruns the identical integer arithmetic — unlike
    ``sampleBy`` (statistical) this gives exact quotas and unlike
    ``LIMIT`` per group it is unbiased w.r.t. storage order. One
    shuffle (the per-stratum window); no global sort.

    The id is reduced mod p BEFORE the multiply (round 17): ``pmod(id, p)
    < 2^30`` and ``_MIX < 2^32`` keep the product under 2^63 for EVERY
    BIGINT id, where the naive ``(id+seed)*_MIX`` wraps silently in
    Spark (non-ANSI) but errors/promotes to HUGEINT in DuckDB above
    id ≈ 3.47e9 — breaking the same-rows-every-engine claim exactly
    where it matters (large id ranges). Congruence ``(x*m) mod p ==
    ((x mod p)*m) mod p`` makes the reduced form identical wherever the
    naive one didn't overflow, so existing fixtures are unaffected."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    p = 1_000_000_007
    order = F.pmod(
        (F.pmod(F.col(id_col), F.lit(p)) + F.lit(seed % p)) * F.lit(_MIX),
        F.lit(p),
    )
    w = Window.partitionBy(strata_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__ssx_rk", F.row_number().over(w))
        .filter(F.col("__ssx_rk") <= k)
        .drop("__ssx_rk")
    )


def temperature_mix_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float = 0.5,
    k: int = 10000,
) -> DataFrame:
    """Temperature-based corpus mixing — the multilingual sampling rule of
    mT5/XLM-R: realized stratum proportions follow ``p_s^alpha`` (counts
    raised to temperature), boosting scarce strata as ``alpha`` drops.
    ``alpha=1`` keeps natural proportions, ``alpha=0`` is the uniform mix,
    0.2-0.7 is the published range for multilingual pretraining.

    Implemented as :func:`weighted_mix_sample` with the weight column
    ``floor(pow(cnt, alpha) * 2^20)`` evaluated on the per-stratum count
    frame. The threshold arithmetic downstream is exact DECIMAL(38,0)
    (see weighted_mix_sample — the earlier all-bigint version wrapped at
    ~1e5 rows/stratum with these weights), so the binding limit is only
    that the WEIGHT itself fits a long: cnt^alpha * 2^20 < 2^63, i.e.
    ~8.8e12 rows per stratum at alpha=1 (looser for smaller alpha) —
    ~three orders of magnitude past a 100 TB text corpus's largest
    source. ``pow`` is one double op computed once per STRATUM, not per
    row; selection stays the deterministic multiplicative hash, so the
    sample is stable across runs, partitionings, and cluster sizes."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    weight = F.expr(f"CAST(floor(pow(_cnt, {alpha!r}) * 1048576) AS BIGINT)")
    return weighted_mix_sample(df, strata_col, weight, id_col=id_col, k=k)


def select_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    token_col: str,
    id_col: str,
) -> DataFrame:
    """Greedy-prefix corpus selection under a TOKEN budget — the "fill
    1T training tokens with the best documents" step: take rows in
    (``score_col`` desc, ``id_col`` asc) order while the running token
    sum stays within ``budget``. The rule is a strict prefix (the first
    row that would overflow stops the take — no skip-ahead to smaller
    docs), so membership is a pure function of the data and both engines
    agree exactly.

    Scale shape — NO global sort of the corpus: phase 1 aggregates
    (score -> docs, tokens) per distinct score (one partial-agg groupBy;
    scores are low-cardinality by construction — quality scores, planted
    tiers, rounded models); the driver cumsums that tiny frame to find
    the BOUNDARY score s* and the residual budget. Phase 2: rows with
    score > s* pass with a map-only filter; only the s* group — one
    score's worth of rows — pays a window cumsum (partitioned on the
    literal boundary, ordered by id). A high-cardinality float score
    should be bucketed/rounded by the caller first; raising when the
    distinct-score frame exceeds 100k rows guards the driver."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    per_score_df = df.groupBy(F.col(score_col).alias("_s")).agg(
        F.sum(F.col(token_col)).alias("_t")
    )
    # guard BEFORE collecting: a pathological high-cardinality score must
    # refuse without first pulling the whole frame to the driver — the
    # limit bounds the probe at 100k+1 rows regardless of cardinality
    n_scores = per_score_df.limit(100_001).count()
    if n_scores > 100_000:
        raise ValueError(
            f">{100_000} distinct scores — bucket/round {score_col} first"
        )
    per_score = per_score_df.collect()
    taken = 0
    boundary = None  # (score, residual budget inside the boundary group)
    for row in sorted(per_score, key=lambda r: r._s, reverse=True):
        if taken + row._t <= budget:
            taken += row._t
        else:
            boundary = (row._s, budget - taken)
            break
    if boundary is None:
        # whole corpus fits
        return df
    s_star, residual = boundary
    above = df.filter(F.col(score_col) > F.lit(s_star))
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at = (
        df.filter(F.col(score_col) == F.lit(s_star))
        .withColumn("_cum", F.sum(F.col(token_col)).over(w))
        .filter(F.col("_cum") <= F.lit(residual))
        .drop("_cum")
    )
    return above.unionByName(at)
