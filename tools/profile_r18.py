"""Round-18 component profiler: decompose the expensive bench cells into
their constituent jobs (guide §1.1 empirical loop) so optimization targets
the measured cost center, not the guessed one.

Each component is timed with the same discipline as bench.py (warm pass,
best-of-3, fresh plan per rep). Eager localCheckpoints ARE the measured
work for signature/pair stages — they run the job at checkpoint time, the
same place the real queries pay it.

Usage: python tools/profile_r18.py [section ...]   # default: all
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import Window, functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, build, reps=3):
    """build() -> a DataFrame to collect, or a no-arg action result."""
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
    print(f"{label:55s} {best:7.3f}s")
    return best


def sec_q121(spark):
    from serverless_etl_bi_on_aws_spark.operators.dedup import (
        band_buckets,
        est_jaccard,
        minhash_signatures,
        neardup_jaccard_pairs,
    )

    real = load_table(spark, SF, "documents").select("doc_id", "text")
    mx = real.agg(F.max("doc_id")).head()[0]
    hi = 2 * (mx // 2) + 2
    twin = " ".join(f"pair{i:03d}" for i in range(150))
    plant = spark.createDataFrame(
        [
            (hi, twin),
            (hi + 1, twin.replace("pair005", "pair900")),
            (hi + 3, " ".join(f"solo{i:03d}" for i in range(150))),
        ],
        "doc_id bigint, text string",
    )
    docs = real.unionByName(plant)
    left = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    right = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)

    print("== q121 components ==")
    timed("max(doc_id) job", lambda: real.agg(F.max("doc_id")))
    timed(
        "sig(left) ckpt",
        lambda: minhash_signatures(left, "doc_id", "text", 3, 128, 42)
        .localCheckpoint(eager=True)
        .sparkSession.range(0),
    )
    timed(
        "sig(right) ckpt",
        lambda: minhash_signatures(right, "doc_id", "text", 3, 128, 42)
        .localCheckpoint(eager=True)
        .sparkSession.range(0),
    )
    timed(
        "sig(union docs) ckpt  [A/B: one job]",
        lambda: minhash_signatures(docs, "doc_id", "text", 3, 128, 42)
        .localCheckpoint(eager=True)
        .sparkSession.range(0),
    )

    sig_l = minhash_signatures(left, "doc_id", "text", 3, 128, 42).localCheckpoint(
        eager=True
    )
    sig_r = minhash_signatures(right, "doc_id", "text", 3, 128, 42).localCheckpoint(
        eager=True
    )

    def band_join():
        bl = band_buckets(sig_l, 32, 4, id_col="doc_id").select(
            F.col("_id").alias("id_l"), "band", "bucket"
        )
        br = band_buckets(sig_r, 32, 4, id_col="doc_id").select(
            F.col("_id").alias("id_r"), "band", "bucket"
        )
        fl = sig_l.select(F.col("doc_id").alias("id_l"), F.col("sig").alias("_s1"))
        fr = sig_r.select(F.col("doc_id").alias("id_r"), F.col("sig").alias("_s2"))
        cand = bl.join(br, ["band", "bucket"]).select("id_l", "id_r").dropDuplicates(
            ["id_l", "id_r"]
        )
        return (
            cand.join(fl, "id_l")
            .join(fr, "id_r")
            .withColumn("est_jaccard", est_jaccard("_s1", "_s2", 128))
            .filter(F.col("est_jaccard") >= 0.5)
            .select("id_l", "id_r", "est_jaccard")
        )

    timed("band join + fetch + filter (from ckpt sigs)", band_join)
    timed(
        "exact jaccard pairs t=0.35 (full docs) ckpt",
        lambda: neardup_jaccard_pairs(docs, n=3, threshold=0.35)
        .localCheckpoint(eager=True)
        .sparkSession.range(0),
    )


def sec_q82(spark):
    from serverless_etl_bi_on_aws_spark.operators.curation import (
        curation_stages,
        neardup_rung,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "source", "text")
    print("== q82 components ==")
    timed(
        "curation_stages (gate + window + uniq ckpt)",
        lambda: curation_stages(docs)[1].sparkSession.range(0),
    )
    _, uniq, _ = curation_stages(docs)
    timed(
        "exact rung over uniq (pairs + anti) count",
        lambda: neardup_rung(uniq, neardup="exact").agg(F.count("*")),
    )
    timed(
        "minhash rung over uniq count",
        lambda: neardup_rung(uniq, neardup="minhash").agg(F.count("*")),
    )


def sec_q12(spark):
    from serverless_etl_bi_on_aws_spark.operators.dedup import neardup_jaccard_pairs

    docs = load_table(spark, SF, "documents")
    print("== q12 components ==")
    timed(
        "neardup_jaccard_pairs df_cap=0.05 (as q12)",
        lambda: neardup_jaccard_pairs(docs, n=3, threshold=0.5, max_df_frac=0.05)
        .select("id_1", "id_2", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("id_1", "id_2"),
    )
    timed(
        "neardup_jaccard_pairs no cap",
        lambda: neardup_jaccard_pairs(docs, n=3, threshold=0.5)
        .select("id_1", "id_2", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("id_1", "id_2"),
    )
    timed("docs.count() alone", lambda: docs.count() and docs.limit(0))
    # does the final adaptive plan reuse the shingle pipeline?
    df = neardup_jaccard_pairs(docs, n=3, threshold=0.5, max_df_frac=0.05)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scan = plan.count("Scan parquet")
    n_reuse = plan.count("ReusedExchange")
    print(f"q12 final plan: {n_scan} parquet scans, {n_reuse} ReusedExchange")


def sec_q80(spark):
    from serverless_etl_bi_on_aws_spark.operators.semantic_dedup import (
        semantic_neardup_pairs,
    )
    from serverless_etl_bi_on_aws_spark.operators.similarity import (
        neardup_cosine_pairs,
    )
    from serverless_etl_bi_on_aws_spark.util import artifact_dir, fixture_digest

    emb = load_table(spark, SF, "embeddings")
    print("== q80 components ==")
    timed(
        "exact cosine pairs >=0.4 ckpt",
        lambda: neardup_cosine_pairs(emb, 0.4)
        .localCheckpoint(eager=True)
        .sparkSession.range(0),
    )
    digest = fixture_digest(SF, ("embeddings",), version="semdedup-k4-s42")[:8]
    asg = spark.read.parquet(artifact_dir(f"spark_graft_semasg_{digest}"))
    timed(
        "clustered pairs ckpt",
        lambda: semantic_neardup_pairs(emb, 0.4, assignments=asg)
        .localCheckpoint(eager=True)
        .sparkSession.range(0),
    )


def sec_q78(spark):
    from serverless_etl_bi_on_aws_spark.sources.multimodal import attach_mp4_media
    from serverless_etl_bi_on_aws_spark.util import fan_out

    print("== q78 components ==")
    docs = fan_out(load_table(spark, SF, "documents").select("doc_id", "source"))
    timed(
        "attach_mp4_media only (encode side)",
        lambda: attach_mp4_media(docs).select("doc_id").agg(F.count("*")),
    )
    from serverless_etl_bi_on_aws_spark.plans.queries import QUERIES

    timed("q78 full", lambda: QUERIES["q78_mp4_frame_stats"](spark, SF))


def sec_floor(spark):
    print("== floors ==")
    region = load_table(spark, "/root/testdata/sf0.001", "region")
    timed("jvm floor (5-row agg)", lambda: region.groupBy().count())

    def ident(it):
        yield from it

    timed(
        "py floor (identity mapInArrow)",
        lambda: region.mapInArrow(ident, region.schema).groupBy().count(),
    )


SECTIONS = {
    "floor": sec_floor,
    "q121": sec_q121,
    "q82": sec_q82,
    "q12": sec_q12,
    "q80": sec_q80,
    "q78": sec_q78,
}


def main():
    names = sys.argv[1:] or list(SECTIONS)
    spark = get_spark("profile-r18")
    for n in names:
        SECTIONS[n](spark)


if __name__ == "__main__":
    main()
