"""Benchmark harness: headline queries (BASELINE.md q1-q7 semantics) on a
warm SparkSession at $SPARK_GRAFT_SF_DIR (default sf0.1), local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Timing protocol (mirrors BASELINE.md's warm-cache DuckDB measurement): each
query executes once untimed (JIT, code cache, file listing), then the best
of two timed runs counts. Spark's fixed per-job overhead is inside the
measurement — only session startup is excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serverless_etl_bi_on_aws_spark.plans.queries import QUERIES
from serverless_etl_bi_on_aws_spark.session import get_spark

#: headline set: BASELINE.md row -> our query name
HEADLINE = {
    "q1": "q1_pricing_summary",
    "q2": "q2_denorm_customer_orders",
    "q3": "q3_sales_by_category",
    "q4": "q4_funnel_counts",
    "q5": "q5_incremental_window",
    "q6": "q6_topk_cosine",
    "q7": "q7_text_stats",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="bench")

    timings: dict[str, float] = {}
    for short, name in HEADLINE.items():
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()  # warm-up: plan, JIT, IO cache
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[short] = round(best, 4)

    print(
        json.dumps(
            {
                "metric": "headline_q1_q7_total_warm",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
