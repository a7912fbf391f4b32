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
    jvm = spark.sparkContext._jvm
    for name in names:
        try:
            df = allq[name](spark, sf_dir)
            txt = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            txt = f"ERROR: {type(ex).__name__}: {ex}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
