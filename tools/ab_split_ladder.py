"""Split-size ladder for the scaling tier's graded slopes (round 12).

The 8 MB BIG_TIER_SPLIT_BYTES was sized in round 3 for the sf1 fixture's
ABSOLUTE q1 time (0.39 s @ 16 MB -> 0.27 s @ 8 MB). The graded quantity
since round 7, though, is the sf1 -> sf10 SLOPE — and split size acts on
the two cells asymmetrically: at 8 MB the sf10 scan is ~140 tasks (4+
waves on 32 cores; wave quantization and per-task overhead ride the
MARGINAL cost), while a larger split underparallelizes sf1 (whose
absolute time is mostly floor anyway). This ladder measures the paired
slope of q1/q3/q44 at several splits in ONE fresh process, scaling-tier
protocol (warm first, GC between reps, paired per-rep slopes), plus the
sf1-tier q6 (q44 kernel at sf1) absolute at each split for the r11
"q6 net-of-floor 15.7" question.

Writes tools/ab_split_ladder.json; prints a compact summary.
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
from bench import HEADLINE, QUERIES, SCALING_EXTRA  # noqa: E402
from serverless_etl_bi_on_aws_spark.session import get_spark  # noqa: E402

SPLITS_MB = (8, 16, 32, 64, 128)
SHORTS = ("q1", "q3", "q44")
REPS = 7


def main() -> None:
    spark = get_spark(app_name="ab_split_ladder")
    sf1 = bench._ensure_benchdata("sf1", copies=10)
    sf10 = bench._ensure_benchdata("sf10", copies=100)
    assert sf1 and sf10
    names = {s: (HEADLINE.get(s) or SCALING_EXTRA[s]) for s in SHORTS}
    out: dict = {}
    for mb in SPLITS_MB:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mb << 20))
        entry: dict = {}
        for short, name in names.items():
            for d in (sf1, sf10):
                QUERIES[name](spark, d).collect()  # warm
            t1, t10 = [], []
            for _ in range(REPS):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                QUERIES[name](spark, sf1).collect()
                t1.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                QUERIES[name](spark, sf10).collect()
                t10.append(time.perf_counter() - t0)
            slopes = sorted((b - a) / 9.0 for a, b in zip(t1, t10))
            q = statistics.quantiles(slopes, n=4, method="inclusive")
            entry[short] = {
                "slope": round(statistics.median(slopes), 4),
                "iqr": [round(q[0], 4), round(q[2], 4)],
                "sf1_med": round(statistics.median(t1), 4),
                "sf10_med": round(statistics.median(t10), 4),
            }
        out[f"{mb}MB"] = entry
    with open(os.path.join(REPO, "tools", "ab_split_ladder.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
