"""Cell ORDER inside a scaling-tier rep: is q1's graded-slope inflation
the sf0.1 cell running before the paired cells? (round 13 — the verdict
asked to either get scaling.q1 under the 2.0 contract or prove the
engine floor.)

Background: the graded scaling.q1 spark slope recorded 0.079-0.091 s/sf
across rounds 9-12 (ratio 1.95/2.01/—/2.01), while every ISOLATED
2-point measurement of the identical 13-paired-rep protocol lands
0.057-0.066 (ab_q1_floor 0.0653; ab_split_ladder @32MB 0.0567; four
fresh-subprocess runs of ab_q1_burnin 0.057-0.068). The burn-in
hypothesis (first-block C2 warmup) was REFUTED by ab_q1_burnin: a
convergence-gated warmup changed nothing. The remaining structural
difference was the rep's cell order: the tier timed (sf0.1, sf1, sf10)
per rep with one System.gc() up front, so the paired cells sat in
ASYMMETRIC slots — sf1 right after gc+tiny-query, sf10 carrying the
accumulated allocation/GC debt of both prior cells.

MEASURED (2026-08-15, this VM, arms interleaved within one session,
13 paired reps per block, 32 MB splits, q1):

  3-cell, sf0.1 FIRST (the r9-r12 graded shape):
      0.0812 [0.0755, 0.0898]   0.0765 [0.0724, 0.0819]
      0.0827 [0.0722, 0.0935]   0.0680 [0.0625, 0.0764]
  2-cell (sf1, sf10 only — the isolated protocol):
      0.0610 [0.0535, 0.0715]   0.0582 [0.0507, 0.0725]
  3-cell, sf0.1 LAST (the fix — paired cells adjacent, post-gc):
      0.0685 [0.0494, 0.0891]   0.0605 [0.0548, 0.0640]
      0.0744 [0.0598, 0.0811]   0.0731 [0.0654, 0.0803]
  3-cell, gc before EVERY cell (rejected):
      0.1122 [0.1031, 0.1174]   0.1120 [0.0896, 0.1311]

Conclusion: the sf0.1-first order inflates the paired (sf10-sf1) slope
~25-35%; moving the diagnostic sf0.1 cell LAST restores the isolated
2-point number while keeping all three absolutes measured. gc before
every cell is far worse — System.gc() starts concurrent work that
bleeds into the following cell. bench.py's _scaling_tier times cells in
(sf1, sf10, sf0.1) order for both engines since round 13.

Run: PYTHONPATH=/root/repo python tools/ab_cell_order.py
(one fresh process; arms interleave internally).
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

REPS = int(os.environ.get("AB_REPS", "13"))


def main() -> None:
    spark = get_spark(app_name="ab_cell_order")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 << 20))
    sf01 = "/root/testdata/sf0.1"
    sf1 = bench._ensure_benchdata("sf1", copies=10)
    sf10 = bench._ensure_benchdata("sf10", copies=100)
    name = HEADLINE["q1"]
    for d in (sf01, sf1, sf10):
        QUERIES[name](spark, d).collect()

    def block(cells):
        t = {c: [] for c in cells}
        for _ in range(REPS):
            spark._jvm.System.gc()
            for c in cells:
                t0 = time.perf_counter()
                QUERIES[name](spark, c).collect()
                t[c].append(time.perf_counter() - t0)
        slopes = sorted((b - a) / 9.0 for a, b in zip(t[sf1], t[sf10]))
        qs = statistics.quantiles(slopes, n=4, method="inclusive")
        return round(statistics.median(slopes), 4), [
            round(qs[0], 4),
            round(qs[2], 4),
        ]

    arms = {
        "first01": (sf01, sf1, sf10),
        "last01": (sf1, sf10, sf01),
        "2cell": (sf1, sf10),
    }
    out: dict = {k: [] for k in arms}
    for _round in range(2):  # interleave arms to share VM phases
        for tag, cells in arms.items():
            med, iqr = block(cells)
            out[tag].append({"slope": med, "iqr": iqr})
            print(tag, med, iqr, flush=True)
    with open(os.path.join(REPO, "tools", "ab_cell_order.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
