"""Reproduce the round-11 graded scaling-tier inflation (VERDICT r11,
"What's wrong" #1).

BENCH_r11 recorded scaling.q1 spark slope 0.170 s/sf (ratio 3.66) while
the isolated single-purpose ladder measured 0.0658 (ratio ~1.9), and
DuckDB's own slope moved 0.035 -> 0.046 — so the inflation is not
uniform machine drift; the suspicion is PROCESS-STATE contamination
from tier order (the scaling tier runs after the headline + floor +
LLM + sf1 tiers: ~30 queries of JVM heap, code-cache, and Python-worker
history).

This script answers it directly: the IDENTICAL ``_scaling_tier`` runs
twice in one process —

  EARLY: first thing after session start (pristine JVM, no Python
         workers yet), under the same 8 MB big-tier split override the
         graded slot uses;
  LATE:  in its exact graded slot — after headline, floor, LLM (session
         split), and sf1 (8 MB override) have all run, same override.

If LATE >> EARLY the r11 inflation is attributed to tier order /
process state and the structural fix (each tier in its own subprocess)
is justified by measurement. Note the EARLY pass also page-cache-warms
the sf1/sf10 fixtures, which if anything should make LATE *faster* —
so a LATE inflation is a conservative positive.

Writes tools/ab_tier_order.json and prints a compact summary line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from serverless_etl_bi_on_aws_spark.session import get_spark  # noqa: E402


def slim(scal: dict) -> dict:
    return {
        q: {
            "spark_slope": e.get("spark_slope_per_sf"),
            "spark_iqr": e.get("spark_slope_iqr"),
            "duckdb_slope": e.get("duckdb_slope_per_sf"),
            "ratio": e.get("slope_ratio"),
        }
        for q, e in scal.items()
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_tier_order")
    sf1 = bench._ensure_benchdata("sf1", copies=10)
    sf10 = bench._ensure_benchdata("sf10", copies=100)
    assert sf1 and sf10, "benchdata missing"
    default_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    split_key = "spark.sql.files.maxPartitionBytes"

    # EARLY: pristine process, graded conf
    spark.conf.set(split_key, str(bench.BIG_TIER_SPLIT_BYTES))
    early = bench._scaling_tier(spark, sf_dir, sf1, sf10)
    spark.conf.set(split_key, default_split)

    # Contaminating workload, exact graded order & conf
    headline = {
        s: bench._time_best(spark, n, sf_dir) for s, n in bench.HEADLINE.items()
    }
    floor = bench._floor(spark)
    llm = bench._llm_tier(spark, sf_dir)
    spark.conf.set(split_key, str(bench.BIG_TIER_SPLIT_BYTES))
    sf1_tier = bench._sf1_tier(spark, sf1)

    # LATE: the graded slot
    late = bench._scaling_tier(spark, sf_dir, sf1, sf10)
    spark.conf.set(split_key, default_split)

    out = {
        "early": slim(early),
        "late": slim(late),
        "headline_total": round(sum(headline.values()), 3),
        "llm_total": round(sum(llm.values()), 3),
        "sf1_total": sf1_tier.get("total"),
    }
    with open(os.path.join(REPO, "tools", "ab_tier_order.json"), "w") as f:
        json.dump({"early_full": early, "late_full": late, **out}, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
