"""The training-data curation funnel — the LLM-pipeline operators
composed in their production order (north-star X2/X5; SURVEY.md §2.10):

    raw -> quality filter -> exact dedup -> n-gram near-dup dedup -> report

Each stage is an existing first-class operator (functions/text.
quality_score, the keep-min-id exact rule, operators/dedup.
neardup_jaccard_pairs with the dominance drop); this module owns only
their composition, so a pipeline author gets the standard funnel in one
call and the per-stage DataFrames for anything custom. q81 is the
driver-gated face: the whole chain is SQL-expressible, so the composed
result is value-hash-compared against DuckDB end to end.

Scale shape: quality scoring is map-only; exact dedup is ONE shuffle on
the text (content identity is the partition key); the near-dup stage is
the inverted-index shingle join (pairs meet only on shared shingles —
``max_df_frac`` passes through for the hot-shingle cap at corpus scale);
the report is tiny per-group aggregates. Nothing is all-pairs, nothing
collects. At 100 TB run the stages as separate materialized hops (each
is one write) so a crashed near-dup pass doesn't re-pay quality scoring
— exactly the reference's staged-landing discipline (README.md:63-70).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from serverless_etl_bi_on_aws_spark.functions.text import quality_score, token_count
from serverless_etl_bi_on_aws_spark.operators.dedup import (
    neardup_jaccard_pairs,
    neardup_minhash_lsh,
)


def curation_stages(
    docs: DataFrame,
    quality_threshold: float = 0.49999,
    jaccard_threshold: float = 0.35,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    max_df_frac: float | None = None,
    neardup: str = "exact",
    num_hashes: int = 128,
    bands: int = 32,
    seed: int = 42,
    html_col: str | None = None,
    html_min_words: int = 3,
    html_max_link_density: float = 0.34,
    gopher: bool = False,
    dsir_weights: DataFrame | None = None,
    dsir_min_milli: int = 0,
    blocklist_terms: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns the three surviving sets ``(quality, uniq, final)``:

    * ``quality`` — rows with ``quality_score(text) >= quality_threshold``;
    * ``uniq`` — minus exact duplicates: MIN(id) per identical text wins
      (the reference's staging-merge keep-one rule, README.md:67-70,
      applied to content identity);
    * ``final`` — minus near-duplicates: ``shingle_n``-gram Jaccard >=
      ``jaccard_threshold`` pairs under the dominance rule (every id_2
      drops — q12/q50's family; order-independent, no iteration).

    ``neardup`` selects the pair generator for the third rung (round-10
    verdict #3 — the funnel hardwired the exact inverted-index join,
    so the repo's own scale answer couldn't be chosen):

    * ``"exact"`` (default) — ``neardup_jaccard_pairs``: true shingle
      Jaccard via the inverted index; the SQL-expressible, q81-oracled
      form. The shingle join is the expensive stage at corpus scale
      (df-capped via ``max_df_frac``, but still every shared shingle).
    * ``"minhash"`` — ``neardup_minhash_lsh``: banded MinHash-LSH with
      SIGNATURE-ESTIMATED Jaccard >= the same threshold; candidates
      meet only on band-bucket collisions, the 100 TB shape. The
      estimate concentrates around true Jaccard (q13 value-gates the
      recall booleans); ``num_hashes``/``bands``/``seed`` tune the
      S-curve exactly as in q13.

    ``html_col`` prepends the real-world rung (round 14): the raw-crawl
    input is MARKUP, not text — ``functions/html.extract_main_text``
    (tag/script/style subtree drop + block link-density boilerplate
    rule, one map-only Arrow stage) derives ``text_col`` from it before
    the quality gate, so the funnel scores and dedups the MAIN text, not
    the navigation chrome. q86 value-gates the extraction itself; the
    funnel integration is pytest-pinned.

    ``gopher=True`` ANDs the MassiveText rule suite
    (functions/text.gopher_flags, q110-gated) into the quality rung:
    the score gate reads token statistics, the rules read document
    SHAPE (bullet/ellipsis lines, symbol ratio, stop words), so each
    catches documents the other passes. Map-only either way.

    ``blocklist_terms`` (round 17) adds the phrase-blocklist rung
    after the shape gates: documents containing ANY of the dictionary's
    phrases (operators/gazetteer.py occurrence semantics, q127-gated)
    drop before the dedup rungs, so blocked content never reaches a
    persisted index. Pass pre-normalized phrases for case-insensitive
    screening.

    ``dsir_weights`` (round 15) adds the target-distribution rung
    (operators/selection.py, q117-gated): documents whose DSIR
    importance score falls below ``dsir_min_milli`` drop after the
    quality/gopher gates — rules judge a document in isolation, DSIR
    judges it against what the caller wants the mixture to look like.
    Pass the MATERIALIZED weights table from ``fit_dsir_weights`` (fit
    once; the rung itself is explode + broadcast join + partial agg —
    the same cost shape as the shingle rung it precedes).

    The uniq set is localCheckpoint'd: it feeds BOTH the pair join's two
    fan-outs and the downstream aggregates, and re-deriving a window over
    the quality filter per consumer re-pays the text shuffle each time."""
    if html_col is not None:
        from serverless_etl_bi_on_aws_spark.functions.html import extract_main_text

        docs = docs.withColumn(
            text_col,
            extract_main_text(
                html_col,
                min_words=html_min_words,
                max_link_density=html_max_link_density,
            ).getField("text"),
        )
    quality = docs.filter(quality_score(text_col) >= F.lit(quality_threshold))
    if gopher:
        from serverless_etl_bi_on_aws_spark.functions.text import gopher_flags

        flag_cols = (
            "g_nwords", "g_wordlen", "g_symbols", "g_ellipsis",
            "g_bullets", "g_alpha", "g_stopwords", "g_pass",
        )
        quality = (
            gopher_flags(quality, text_col)
            .filter(F.col("g_pass"))
            .drop(*flag_cols)
        )
    if blocklist_terms is not None:
        # blocklist rung (round 17, operators/gazetteer.py): reject a
        # document containing ANY blocked phrase — runs right after the
        # shape gates (cheap anti-join against the tagger's ids-only
        # hits) and BEFORE the expensive dedup rungs, so blocked content
        # never reaches the index. One-column ("term") phrase frame,
        # same tokenizer as the funnel; exact occurrence semantics are
        # q127's (gazetteer_tag).
        from serverless_etl_bi_on_aws_spark.operators.gazetteer import (
            gazetteer_tag,
        )

        blocked_ids = (
            gazetteer_tag(
                quality.select(id_col, text_col),
                blocklist_terms,
                text_col=text_col,
                id_col=id_col,
            )
            .select(id_col)
            .dropDuplicates([id_col])
        )
        quality = quality.join(blocked_ids, id_col, "left_anti")
    if dsir_weights is not None:
        from serverless_etl_bi_on_aws_spark.operators.selection import dsir_score

        quality = (
            dsir_score(
                quality, dsir_weights, text_col=text_col, id_col=id_col,
                out_col="__dsir",
            )
            .filter(F.col("__dsir") >= F.lit(int(dsir_min_milli)))
            .drop("__dsir")
        )
    w = Window.partitionBy(text_col)
    uniq = (
        quality.withColumn("_min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_min_id"))
        .drop("_min_id")
        .localCheckpoint(eager=True)
    )
    final = neardup_rung(
        uniq,
        jaccard_threshold=jaccard_threshold,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        max_df_frac=max_df_frac,
        neardup=neardup,
        num_hashes=num_hashes,
        bands=bands,
        seed=seed,
    )
    return quality, uniq, final


def neardup_rung(
    uniq: DataFrame,
    jaccard_threshold: float = 0.35,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    max_df_frac: float | None = None,
    neardup: str = "exact",
    num_hashes: int = 128,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """The funnel's third rung alone: near-dup pairs over an already
    exact-deduped set, dominance rule applied. Exposed so a caller
    comparing STRATEGIES (q82's exact-vs-minhash agreement gate) runs
    both rungs off ONE checkpointed ``uniq`` instead of paying the
    quality gate + text-shuffle window once per strategy."""
    if neardup == "exact":
        pairs = neardup_jaccard_pairs(
            uniq,
            id_col=id_col,
            text_col=text_col,
            n=shingle_n,
            threshold=jaccard_threshold,
            max_df_frac=max_df_frac,
        )
    elif neardup == "minhash":
        pairs = neardup_minhash_lsh(
            uniq,
            id_col=id_col,
            text_col=text_col,
            n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
            threshold=jaccard_threshold,
            seed=seed,
        )
    else:
        raise ValueError(f"neardup must be 'exact' or 'minhash', got {neardup!r}")
    dropped = pairs.select(F.col("id_2").alias("_drop")).distinct()
    return uniq.join(dropped, uniq[id_col] == dropped["_drop"], "left_anti").drop(
        "_drop"
    )


def semantic_curation_stage(
    docs: DataFrame,
    embeddings: DataFrame,
    threshold: float = 0.85,
    n_clusters: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    fit_sample_rows: int | None = None,
) -> DataFrame:
    """The funnel's optional FOURTH rung — semantic dedup over the
    surviving docs' embeddings (the SemDeDup stage modern pipelines run
    after lexical dedup: n-gram Jaccard misses paraphrases; embeddings
    catch them). Compose after :func:`curation_stages`::

        quality, uniq, final = curation_stages(docs)
        curated = semantic_curation_stage(final, embeddings)

    Only embeddings of SURVIVING docs enter the pair search (left-semi
    on the funnel's output — a doc already dropped lexically must not
    shield its semantic twin), and a doc with no embedding passes
    through untouched (real corpora embed a subset; silently dropping
    unembedded docs would turn coverage gaps into data loss). The drop
    rule is the same cluster-pruned dominance as
    :func:`~serverless_etl_bi_on_aws_spark.operators.semantic_dedup.
    semantic_dedup`; pass ``assignments=`` (e.g. a persisted IVF
    corpus's cluster column) to run zero KMeans fits, or
    ``fit_sample_rows`` to bound the fit to a seeded sample (the
    100 TB posture — identical semantics to ``cluster_assignments``)."""
    from serverless_etl_bi_on_aws_spark.operators.semantic_dedup import (
        semantic_neardup_pairs,
    )

    emb = embeddings.join(
        docs.select(F.col(id_col).alias(vec_id_col)), vec_id_col, "left_semi"
    )
    pairs = semantic_neardup_pairs(
        emb,
        threshold,
        n_clusters,
        seed,
        id_col=vec_id_col,
        vec_col=vec_col,
        assignments=assignments,
        fit_sample_rows=fit_sample_rows,
    )
    dropped = pairs.select(F.col("id_2").alias("_drop")).distinct()
    return docs.join(dropped, docs[id_col] == dropped["_drop"], "left_anti")


def curation_report(
    docs: DataFrame,
    group_col: str = "source",
    quality_threshold: float = 0.49999,
    jaccard_threshold: float = 0.35,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    max_df_frac: float | None = None,
    neardup: str = "exact",
    num_hashes: int = 128,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Per-``group_col`` funnel report: (group, n_raw, n_quality,
    n_unique, n_final, tokens_final) — the stage survivor counts plus the
    final whitespace-token budget, what a mix planner consumes. A group
    whose every doc is filtered still reports (zeros, via left joins).
    ``neardup`` selects the near-dup pair generator exactly as in
    :func:`curation_stages`."""
    quality, uniq, final = curation_stages(
        docs,
        quality_threshold,
        jaccard_threshold,
        id_col,
        text_col,
        shingle_n,
        max_df_frac,
        neardup,
        num_hashes,
        bands,
        seed,
    )
    raw_c = docs.groupBy(group_col).agg(F.count("*").alias("n_raw"))
    q_c = quality.groupBy(group_col).agg(F.count("*").alias("_nq"))
    u_c = uniq.groupBy(group_col).agg(F.count("*").alias("_nu"))
    f_c = final.groupBy(group_col).agg(
        F.count("*").alias("_nf"),
        F.sum(token_count(text_col)).alias("_tf"),
    )
    zero = F.lit(0).cast("bigint")
    return (
        raw_c.join(q_c, group_col, "left")
        .join(u_c, group_col, "left")
        .join(f_c, group_col, "left")
        .select(
            group_col,
            "n_raw",
            F.coalesce(F.col("_nq"), zero).alias("n_quality"),
            F.coalesce(F.col("_nu"), zero).alias("n_unique"),
            F.coalesce(F.col("_nf"), zero).alias("n_final"),
            F.coalesce(F.col("_tf"), zero).alias("tokens_final"),
        )
        .orderBy(group_col)
    )


def drop_frequent_paragraphs(
    docs: DataFrame,
    min_df: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-frequency paragraph boilerplate removal (round 14) — the
    CCNet/RefinedWeb line-dedup rule: a paragraph appearing in >=
    ``min_df`` DISTINCT documents is boilerplate (subscribe banners,
    copyright footers, cookie notices) no matter what any single page
    looks like, and is dropped from EVERY document; surviving paragraphs
    are re-joined in their original order. The corpus-level complement
    of functions/html.py's per-page link-density rule — chrome that
    survives per-page extraction (plain-text banners carry no links)
    still falls to corpus frequency.

    Returns ``(id_col, text_col, paras_kept, paras_dropped)`` — one row
    per input document (a document whose every paragraph is boilerplate
    survives with empty text and its counts, so downstream quality
    gates see it rather than it silently vanishing).

    Scale shape: posexplode (map-only) -> ONE shuffle keyed by the
    paragraph text for the distinct-document frequency -> one shuffle
    join back -> per-document re-assembly grouped by id. Nothing is
    all-pairs, nothing collects. At 100 TB key the frequency/join
    stages on ``xxhash64(para)`` instead of the raw string (64-bit
    collisions are negligible at any corpus size and the exchange ships
    8-byte keys); the string form here keeps the operator bit-exactly
    SQL-expressible for the q88 oracle."""
    # ``sep`` is a LITERAL separator on both sides: F.split takes a regex,
    # so it is escaped here — otherwise a caller's "|" or "." separator
    # would silently split on every character while concat_ws re-joined
    # with the literal (the round-13-ADVICE class of silent mismatch)
    import re as _re

    paras = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            "_pos", "_para"
        ),
    )
    freq = paras.groupBy("_para").agg(
        F.countDistinct(id_col).alias("_df")
    )
    flagged = paras.join(freq, "_para").withColumn(
        "_drop", F.col("_df") >= F.lit(min_df)
    )
    kept_text = F.concat_ws(
        sep,
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        ~F.col("_drop"), F.struct("_pos", "_para")
                    )
                )
            ),
            lambda x: x["_para"],
        ),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            kept_text.alias(text_col),
            F.sum((~F.col("_drop")).cast("long")).alias("paras_kept"),
            F.sum(F.col("_drop").cast("long")).alias("paras_dropped"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_overlap: float = 0.0,
) -> DataFrame:
    """Benchmark decontamination — the REMOVAL step whose measurement is
    q54's contamination check: drop every training doc sharing too many
    distinct word n-grams with the held-out eval corpus (the GPT-3/PaLM
    discipline: published pipelines drop on any 8-13-gram collision).

    ``max_overlap=0.0`` drops a doc on ANY shared distinct n-gram — one
    semi-join against the deduped benchmark gram set, no aggregate.
    ``0 < max_overlap < 1`` drops docs whose contaminated FRACTION of
    distinct n-grams exceeds it; the threshold compare is exact integer
    arithmetic (10000*hits > round(max_overlap*10000)*grams), never a
    float product, so a doc sitting exactly on the boundary is KEPT by
    the same rule in every engine (the DuckDB oracle replays it
    verbatim). Docs with fewer than ``n`` tokens carry no n-gram and
    always survive.

    Scale shape: q54's inverted-index discipline — distinct shingles per
    doc explode once, ONE equi join on the gram (the benchmark side is
    distinct and SMALL — it's an eval set — so AQE broadcasts it), a
    per-doc count aggregate only on the rate path, then one anti-join.
    Nothing all-pairs, nothing collected."""
    from serverless_etl_bi_on_aws_spark.functions.text import shingles_from_tokens

    if not 0.0 <= max_overlap < 1.0:
        raise ValueError("max_overlap must be in [0, 1)")
    bench_grams = (
        benchmark.select(F.split(text_col, " ").alias("_t"))
        .select(F.explode(shingles_from_tokens("_t", n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("_did"), F.split(text_col, " ").alias("_t")
    ).select("_did", F.explode(shingles_from_tokens("_t", n)).alias("gram"))
    if max_overlap == 0.0:
        dirty = (
            doc_grams.join(bench_grams, "gram", "left_semi")
            .select("_did")
            .distinct()
        )
    else:
        thresh = round(max_overlap * 10000)
        dirty = (
            doc_grams.join(
                bench_grams.withColumn("_hit", F.lit(1)), "gram", "left"
            )
            .groupBy("_did")
            .agg(
                F.count("*").alias("_n"),
                F.sum(
                    F.when(F.col("_hit").isNotNull(), 1).otherwise(0)
                ).alias("_c"),
            )
            .filter(F.col("_c") * 10000 > F.col("_n") * F.lit(thresh))
            .select("_did")
        )
    return docs.join(dirty, docs[id_col] == dirty["_did"], "left_anti")
