"""Round-19 component profiler: decompose the remaining expensive bench
cells (q82's rung pair, q13's LSH pipeline) into constituent jobs and A/B
candidate reformulations in ONE session (guide §1.1; this VM's cross-session
phase noise exceeds most wins, so same-session interleaved A/Bs are the only
trustworthy evidence — OPTIMIZATION_r18 measurement setup).

Usage: python tools/profile_r19.py [section ...]   # default: all
Sections: q82, q13, q82ab, q13ab
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, build, reps=3):
    def run():
        r = build()
        if hasattr(r, "collect"):
            r.collect()

    run()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:58s} {best:7.3f}s", flush=True)
    return best


def _uniq(spark):
    from serverless_etl_bi_on_aws_spark.operators.curation import curation_stages

    docs = load_table(spark, SF, "documents").select("doc_id", "source", "text")
    _, uniq, _ = curation_stages(docs)
    return uniq


def sec_q82(spark):
    """Decompose q82: uniq build, exact rung, minhash rung, final."""
    from serverless_etl_bi_on_aws_spark.operators.curation import (
        curation_stages,
        neardup_rung,
    )
    from serverless_etl_bi_on_aws_spark.operators.dedup import (
        minhash_signatures,
        neardup_jaccard_pairs,
        shingle_rows,
    )
    from serverless_etl_bi_on_aws_spark.plans.queries import EXTRA_QUERIES, QUERIES

    docs = load_table(spark, SF, "documents").select("doc_id", "source", "text")
    timed("q82: uniq build (gate+window+ckpt)", lambda: _uniq(spark))
    uniq = _uniq(spark)

    timed("q82: shingle front over uniq (noop agg)",
          lambda: shingle_rows(uniq, text_col="text").groupBy().count())
    timed("q82: exact pairs (neardup_jaccard_pairs thr=.35)",
          lambda: neardup_jaccard_pairs(uniq, n=3, threshold=0.35))
    timed("q82: exact rung (pairs + dominance anti-join)",
          lambda: neardup_rung(uniq, neardup="exact"))
    timed("q82: minhash signatures over uniq (own front)",
          lambda: minhash_signatures(uniq))
    timed("q82: minhash rung (lsh + dominance)",
          lambda: neardup_rung(uniq, neardup="minhash"))
    q = {**QUERIES, **EXTRA_QUERIES}["q82_minhash_curation_verify"]
    timed("q82: WHOLE CELL", lambda: q(spark, SF))


def _jaccard_pairs_ids_only(uniq, threshold=0.35):
    """Candidate reformulation (guide §2.3 — shuffle fewer bytes): the
    shingle self-join carries (_id, _shingle) only; per-doc sizes ride a
    separate tiny aggregate joined to the PAIR-sized result."""
    from serverless_etl_bi_on_aws_spark.operators.dedup import shingle_rows

    sh = shingle_rows(uniq, text_col="text")
    ids = sh.select("_id", "_shingle")
    sizes = sh.groupBy("_id").agg(F.first("_n").alias("_n"))
    inter = (
        ids.alias("a")
        .join(ids.alias("b"), on="_shingle")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_1"), F.col("b._id").alias("id_2"))
        .agg(F.count("*").alias("_inter"))
    )
    return (
        inter.join(sizes.select(F.col("_id").alias("id_1"), F.col("_n").alias("_n1")), "id_1")
        .join(sizes.select(F.col("_id").alias("id_2"), F.col("_n").alias("_n2")), "id_2")
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.col("_n1") + F.col("_n2") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def sec_q82ab(spark):
    """A/B the exact-rung reformulations over one checkpointed uniq."""
    from serverless_etl_bi_on_aws_spark.operators.dedup import neardup_jaccard_pairs

    uniq = _uniq(spark)
    cur = timed("A: current pairs (sizes ride the join)",
                lambda: neardup_jaccard_pairs(uniq, n=3, threshold=0.35))
    new = timed("B: ids-only join + size fetch",
                lambda: _jaccard_pairs_ids_only(uniq))
    cur2 = timed("A2: current again (order control)",
                 lambda: neardup_jaccard_pairs(uniq, n=3, threshold=0.35))
    new2 = timed("B2: ids-only again", lambda: _jaccard_pairs_ids_only(uniq))
    a = sorted(map(tuple, neardup_jaccard_pairs(uniq, n=3, threshold=0.35).collect()))
    b = sorted(map(tuple, _jaccard_pairs_ids_only(uniq).collect()))
    print(f"rows identical: {a == b} ({len(a)} pairs)")
    print(f"speedup best-pair: {min(cur, cur2) / min(new, new2):.2f}x")


def sec_q13(spark):
    """Decompose q13: signature job, banding+candidate join, fetches."""
    from serverless_etl_bi_on_aws_spark.operators.dedup import (
        band_buckets,
        est_jaccard,
        minhash_signatures,
        neardup_minhash_lsh,
    )

    docs = load_table(spark, SF, "documents")
    timed("q13: signature job (ckpt)", lambda: minhash_signatures(docs))
    sigs = minhash_signatures(docs).localCheckpoint(eager=True)
    banded = band_buckets(sigs, 32, 4)
    timed("q13: banding (noop agg over banded)", lambda: banded.groupBy().count())

    def cand():
        return (
            banded.alias("a")
            .join(banded.alias("b"), on=["band", "bucket"])
            .filter(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_1"), F.col("b._id").alias("id_2"))
            .dropDuplicates(["id_1", "id_2"])
        )

    timed("q13: candidate join + dedup", cand)

    def full_from_sigs():
        c = cand()
        return (
            c.join(sigs.select(F.col("doc_id").alias("id_1"), F.col("sig").alias("_s1")), "id_1")
            .join(sigs.select(F.col("doc_id").alias("id_2"), F.col("sig").alias("_s2")), "id_2")
            .withColumn("est_jaccard", est_jaccard("_s1", "_s2", 128))
            .filter(F.col("est_jaccard") >= 0.5)
            .select("id_1", "id_2", "est_jaccard")
        )

    timed("q13: cand + sig fetch + estimate", full_from_sigs)
    timed("q13: WHOLE operator (incl. sig job)",
          lambda: neardup_minhash_lsh(docs, n=3, num_hashes=128, bands=32, threshold=0.5))


def sec_q13ab(spark):
    """A/B q13 variants: candidate join carrying signatures vs fetch-after
    (the round-8 decision, re-checked), and a single-fetch formulation."""
    from serverless_etl_bi_on_aws_spark.operators.dedup import (
        band_buckets,
        est_jaccard,
        minhash_signatures,
    )

    docs = load_table(spark, SF, "documents")
    sigs = minhash_signatures(docs).localCheckpoint(eager=True)
    banded = band_buckets(sigs, 32, 4)

    def fetch_after():
        c = (
            banded.alias("a")
            .join(banded.alias("b"), on=["band", "bucket"])
            .filter(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_1"), F.col("b._id").alias("id_2"))
            .dropDuplicates(["id_1", "id_2"])
        )
        return (
            c.join(sigs.select(F.col("doc_id").alias("id_1"), F.col("sig").alias("_s1")), "id_1")
            .join(sigs.select(F.col("doc_id").alias("id_2"), F.col("sig").alias("_s2")), "id_2")
            .withColumn("est_jaccard", est_jaccard("_s1", "_s2", 128))
            .filter(F.col("est_jaccard") >= 0.5)
            .select("id_1", "id_2", "est_jaccard")
        )

    a = timed("A: fetch-after (current)", fetch_after)
    a2 = timed("A2: fetch-after again", fetch_after)
    ra = sorted(map(tuple, fetch_after().collect()))
    print(f"pairs: {len(ra)}")


def main():
    sections = sys.argv[1:] or ["q82", "q82ab", "q13", "q13ab"]
    spark = get_spark("profile-r19")
    for s in sections:
        print(f"== {s} ==", flush=True)
        globals()[f"sec_{s}"](spark)


if __name__ == "__main__":
    main()
