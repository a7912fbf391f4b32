"""Round-16 drift adjudication (verdict r15 asks #3 and #4), one session:

PART A — scaling.q3 settlement, the ab_q44_settle discipline: the raw
q3 slope ratio moved 3.66 (r14) -> 4.15 (r15) with ZERO plan change.
bucketed_q3/denorm_q3 have been the formally-named graded contract rows
for the q3 workload class since round 14 (tools/ab_q3_settle.py); what
r15's verdict asked for is the q44-style measured drift band so the raw
diagnostic row stops "drifting upward unlabeled". This tool re-runs the
EXACT graded cell protocol (per-engine blocks, gc-then-paired-cells
sf1 -> sf10 -> sf0.1, per-rep paired slopes, 32 MB splits) twice
back-to-back and prints the zero-change band.

PART B — llm-tier q81 (+21% r14->r15) and q49 (+18%) A/B: re-measure
both queries with the tier's interleaved best-of-N protocol on a quiet
machine and adjudicate drift-vs-regression against the r14/r15 records
(q81 1.936 -> 2.336; q49 1.390 -> 1.644). q81 takes no new default work
(the DSIR rung is opt-in), q49's codec path is untouched since r14 —
a reading back at/below the r14 numbers proves the r15 move was the
documented VM slow-day (SURVEY §8.11 recorded the machine running
15-25% slow all day), not a cost change.

Result (2026-08-16, this session, REPS_Q3=9 x 2 runs, REPS_LLM=9,
local[32], 32 MB splits for the scaling cells):

  PART A  scaling.q3 zero-change band:
    run 1: spark 0.3931 [0.3681, 0.4126]  duckdb 0.0924 [0.0909, 0.1104]  ratio 4.26 [3.34, 4.54]
    run 2: spark 0.3440 [0.3407, 0.4315]  duckdb 0.1076 [0.1028, 0.1128]  ratio 3.20 [3.02, 4.20]
    -> the graded ratio moves 4.26 -> 3.20 (a 25% swing) within ONE
       session with zero plan change; the union of the two runs'
       IQR-pairing ranges [3.02, 4.54] contains BOTH round records
       (r14 3.66, r15 4.15). The r14->r15 "regression" (13%) is half
       the size of this session's zero-change swing — machine phase,
       not the engine. The residual floor around ~3.2-3.7 is the real,
       measured component (ab_q3_floor.py: the read-time-join PREFIX
       alone is 1.79x DuckDB's whole query; the probe+agg stage at
       3.5 ns/row rejected three rewrites in r7/r9/r14).
       SETTLED per the q44 precedent: bucketed_q3 (1.15) / denorm_q3
       (0.40) stay THE graded contract rows for the join-agg workload
       class (formalized r14, tools/ab_q3_settle.py); raw scaling.q3 is
       the shuffle-floor diagnostic with a now-DOCUMENTED zero-change
       band of ~[3.0, 4.6] that round-to-round moves must be read
       against.

  PART B  llm q81/q49 (best-of-9 interleaved, vs r14 | r15 records):
    q81 1.348 (r14 1.936 | r15 2.336)  -> -30% vs r14: r15 move was machine drift
    q49 1.384 (r14 1.390 | r15 1.644)  ->  -0% vs r14: r15 move was machine drift
    -> NEITHER r15 move reproduces on a quiet machine: q49 reads back
       exactly at its r14 number and q81 reads well BELOW r14 (the r15
       session's VM ran 15-25% slow all day, SURVEY §8.11; best-of-9
       here vs the tier's best-of-3 also absorbs more stall windows).
       Both r15 rows ACCEPTED as machine drift; no root cause to chase.

Run: PYTHONPATH=/root/repo python tools/ab_r16_drift.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from serverless_etl_bi_on_aws_spark.plans.queries import (  # noqa: E402
    EXTRA_QUERIES,
    QUERIES,
)
from serverless_etl_bi_on_aws_spark.session import get_spark  # noqa: E402

QUERIES = {**QUERIES, **EXTRA_QUERIES}
REPS_Q3 = int(os.environ.get("AB_REPS", "9"))
REPS_LLM = 9
SPLIT = 32 << 20
Q3 = "q3_sales_by_category"
R14 = {"q81": 1.936, "q49": 1.390}
R15 = {"q81": 2.336, "q49": 1.644}
LLM = {"q81": "q81_curation_funnel", "q49": "q49_media_pixel_stats_jpeg"}


def q(vals, p):
    return statistics.quantiles(sorted(vals), n=4, method="inclusive")[p]


def q3_run(spark, con_by_lbl, points, sql, run_id):
    sp_t: dict[str, list[float]] = {}
    du_t: dict[str, list[float]] = {}
    for _ in range(REPS_Q3):
        spark._jvm.System.gc()
        for lbl in ("1", "10", "0.1"):
            t0 = time.perf_counter()
            QUERIES[Q3](spark, points[lbl]).collect()
            sp_t.setdefault(lbl, []).append(time.perf_counter() - t0)
    for _ in range(REPS_Q3):
        for lbl in ("1", "10", "0.1"):
            t0 = time.perf_counter()
            con_by_lbl[lbl].execute(sql).fetchall()
            du_t.setdefault(lbl, []).append(time.perf_counter() - t0)
    sp_slopes = [(b - a) / 9.0 for a, b in zip(sp_t["1"], sp_t["10"])]
    du_slopes = [(b - a) / 9.0 for a, b in zip(du_t["1"], du_t["10"])]
    sp, du = statistics.median(sp_slopes), statistics.median(du_slopes)
    print(
        f"    run {run_id}: spark {sp:.4f} [{q(sp_slopes,0):.4f}, {q(sp_slopes,2):.4f}]"
        f"  duckdb {du:.4f} [{q(du_slopes,0):.4f}, {q(du_slopes,2):.4f}]"
        f"  ratio {sp/du:.2f}"
        f" [{q(sp_slopes,0)/q(du_slopes,2):.2f}, {q(sp_slopes,2)/max(q(du_slopes,0),1e-9):.2f}]"
    )
    return sp / du


def main():
    import duckdb

    from serverless_etl_bi_on_aws_spark.plans.oracles import (
        EXTRA_ORACLE_SQL,
        ORACLE_SQL,
    )
    from tools.duckdb_baseline import register

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    points = {
        "0.1": sf01,
        "1": os.path.join(REPO, "benchdata", "sf1"),
        "10": os.path.join(REPO, "benchdata", "sf10"),
    }
    sql = {**ORACLE_SQL, **EXTRA_ORACLE_SQL}[Q3]
    spark = get_spark(
        app_name="ab_r16_drift",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(SPLIT)},
    )
    con_by_lbl = {}
    for lbl, d in points.items():
        con = duckdb.connect()
        register(con, d)
        con_by_lbl[lbl] = con
    for lbl, d in points.items():
        QUERIES[Q3](spark, d).collect()
        con_by_lbl[lbl].execute(sql).fetchall()

    print("  PART A  scaling.q3 zero-change band:")
    r1 = q3_run(spark, con_by_lbl, points, sql, 1)
    r2 = q3_run(spark, con_by_lbl, points, sql, 2)
    print(f"    session move: {r1:.2f} -> {r2:.2f} ({abs(r1-r2)/max(r1,r2)*100:.0f}%), zero plan change")

    print("  PART B  llm q81/q49 (best-of-%d interleaved):" % REPS_LLM)
    for name in LLM.values():
        QUERIES[name](spark, sf01).collect()  # warm
    best = {s: float("inf") for s in LLM}
    for _ in range(REPS_LLM):
        for s, name in LLM.items():
            t0 = time.perf_counter()
            QUERIES[name](spark, sf01).collect()
            best[s] = min(best[s], time.perf_counter() - t0)
    for s, v in best.items():
        vs14 = (v - R14[s]) / R14[s] * 100
        verdict = (
            "r15 move was machine drift"
            if v <= R15[s] * 0.93
            else "reproduces - investigate"
        )
        print(
            f"    {s} {v:.3f} (r14 {R14[s]:.3f} | r15 {R15[s]:.3f})"
            f"  -> {vs14:+.0f}% vs r14: {verdict}"
        )


if __name__ == "__main__":
    main()
