"""Capture .explain("formatted") for every declared query (driver QUERIES
plus the bench-timed EXTRA entries) into plans/<tag>/<name>_<suffix>.txt —
the optimization round's plan-evidence artifact (guide §1.4/§7.2).

Usage: python tools/capture_plans.py <tag> <suffix> [query_name ...]
e.g.   python tools/capture_plans.py r18 before
"""

from __future__ import annotations

import os
import sys

from serverless_etl_bi_on_aws_spark.plans.queries import EXTRA_QUERIES, QUERIES
from serverless_etl_bi_on_aws_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: bench-timed EXTRA queries (bench.py HEADLINE/LLM_TIER values not in the
#: driver's 50) — the optimization round covers the benched union.
BENCH_EXTRA = (
    "q2_denorm_customer_orders",
    "q44_topk_cosine_arrow",
    "q12_neardup_jaccard",
    "q13_neardup_minhash_lsh",
    "q24_embedding_similar_pairs",
    "q38_chunked_docs",
    "q40_pack_token_shards",
    "q41_pack_shards_by_lang",
    "q42_media_pixel_stats",
    "q43_neardup_embedding_cosine",
    "q49_media_pixel_stats_jpeg",
    "q51_audio_pcm_stats",
    "q52_video_frame_stats",
    "q53_tfidf_top_terms",
    "q54_contamination_check",
    "q55_repetition_stats",
    "q64_span_dedup",
    "q79_audio_fingerprint_dedup",
    "q98_warc_ingest_verify",
    "q110_gopher_rules",
    "q111_compression_quality",
    "q121_similarity_join_operator",
)


def _explain_formatted(spark, df) -> str:
    """Formatted physical plan, preferring the one-call JVM helper with a
    public-API fallback (round-18 ADVICE: PythonSQLUtils/queryExecution are
    private internals — tooling must not break across Spark upgrades)."""
    try:
        return spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:  # noqa: BLE001 - fall back to the public API
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        return buf.getvalue()


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        names = list(QUERIES) + [n for n in BENCH_EXTRA if n not in QUERIES]
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    allq = {**QUERIES, **EXTRA_QUERIES}

    # Round-19 (r18 verdict ask #7): multi-job query cells hide their real
    # work behind eager localCheckpoints — the final frame's explain shows
    # only Scan ExistingRDD stubs, so the r18 "plan diff" for q121's verify
    # cell was expression-id churn. Wrapping DataFrame.localCheckpoint
    # captures each checkpointed subtree's OWN plan (in build order) into
    # <name>_<suffix>_ckpt<N>.txt, which is where the shuffles actually are.
    # patch the RUNTIME DataFrame class (Spark 4 classic mode subclasses
    # pyspark.sql.dataframe.DataFrame — patching the base would miss it)
    df_cls = type(spark.range(1))
    orig_ckpt = df_cls.localCheckpoint
    ckpt_plans: list[str] = []

    def capturing_ckpt(self, *args, **kwargs):
        try:
            ckpt_plans.append(_explain_formatted(spark, self))
        except Exception as ex:  # noqa: BLE001 - capture must never break the build
            ckpt_plans.append(f"ERROR capturing checkpoint plan: {ex}\n")
        return orig_ckpt(self, *args, **kwargs)

    df_cls.localCheckpoint = capturing_ckpt
    try:
        for name in names:
            ckpt_plans.clear()
            try:
                df = allq[name](spark, sf_dir)
                txt = _explain_formatted(spark, df)
            except Exception as ex:  # noqa: BLE001
                txt = f"ERROR: {type(ex).__name__}: {ex}\n"
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
            print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")
            for i, ptxt in enumerate(ckpt_plans):
                p = os.path.join(out_dir, f"{name}_{suffix}_ckpt{i}.txt")
                with open(p, "w") as f:
                    f.write(ptxt)
                print(f"wrote {os.path.basename(p)} ({len(ptxt)} bytes)")
    finally:
        df_cls.localCheckpoint = orig_ckpt
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
