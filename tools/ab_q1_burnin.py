"""Does the graded scaling tier's q1 slope inflation come from running
q1 as the FIRST measured block of a fresh subprocess? (round 13)

Evidence motivating the question: the r12 graded scaling.q1 spark slope
was 0.091 s/sf, while every isolated / late-in-session measurement of
the identical 13-paired-rep protocol lands 0.057-0.066 (ab_q1_floor
0.0653; ab_split_ladder @32MB 0.0567, measured ~15 min into its
session) — and the round-12 ladder already showed the first-measured
block of a session overstates its cost (C2 compilation + page cache
still landing after single warm passes). Since r12 each tier is its own
subprocess, so the scaling tier's first block (q1, by SCALING_QUERIES
order) is ALWAYS a fresh-JVM first block.

Protocol: each arm runs in THIS fresh process (run the script once per
arm via AB_ARM, several times alternating to dodge VM phases):

  arm "single"  — the tier's historical warmup: ONE warm pass per
                  (sf) cell, then 13 paired reps (the graded shape).
  arm "burnin"  — warm passes repeat until two consecutive sf10 passes
                  agree within 10% (cap 8), then the same 13 reps.

Prints one JSON line {arm, warm_passes, slope, iqr, warm_trace}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from bench import HEADLINE, QUERIES  # noqa: E402
from serverless_etl_bi_on_aws_spark.session import get_spark  # noqa: E402


def main() -> None:
    arm = os.environ.get("AB_ARM", "burnin")
    reps = int(os.environ.get("AB_REPS", "13"))
    spark = get_spark(app_name=f"ab_q1_burnin_{arm}")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 << 20))
    sf1 = bench._ensure_benchdata("sf1", copies=10)
    sf10 = bench._ensure_benchdata("sf10", copies=100)
    name = HEADLINE["q1"]
    points = {"1": sf1, "10": sf10}

    warm_trace = []
    for d in points.values():
        QUERIES[name](spark, d).collect()
    t0 = time.perf_counter()
    QUERIES[name](spark, sf10).collect()
    warm_trace.append(round(time.perf_counter() - t0, 3))
    if arm == "burnin":
        for _ in range(7):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf10).collect()
            warm_trace.append(round(time.perf_counter() - t0, 3))
            if abs(warm_trace[-1] - warm_trace[-2]) <= 0.1 * warm_trace[-2]:
                break
            QUERIES[name](spark, sf1).collect()

    t1, t10 = [], []
    for _ in range(reps):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf1).collect()
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf10).collect()
        t10.append(time.perf_counter() - t0)
    slopes = sorted((b - a) / 9.0 for a, b in zip(t1, t10))
    qs = statistics.quantiles(slopes, n=4, method="inclusive")
    print(
        json.dumps(
            {
                "arm": arm,
                "warm_passes": len(warm_trace),
                "slope": round(statistics.median(slopes), 4),
                "iqr": [round(qs[0], 4), round(qs[2], 4)],
                "warm_trace": warm_trace,
            }
        )
    )


if __name__ == "__main__":
    main()
