"""Interleaved A/B: SHUFFLE_HASH hint vs plain SMJ on the co-bucketed q3 join.

Round-3 verdict (What's wrong #1): the recorded BENCH_r03 artifact shows the
hinted sf10 run 25% SLOWER than round-2's unhinted run, contradicting the
in-code comment. This script measures both variants interleaved (A,B,A,B,...)
in ONE session at sf1 and sf10, best-of-N + median, so VM stall windows hit
both arms equally.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from serverless_etl_bi_on_aws_spark.catalog import load_table  # noqa: E402
from serverless_etl_bi_on_aws_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("AB_REPS", "7"))


def q3b(spark, li_t, od_t, sf_dir, hint: bool):
    # v2 bucket layout (round 7): category materialized into the fact at
    # ingest — the A/B question (SMJ bucket re-sorts vs shuffle-hash build
    # on co-bucketed sides) is unchanged; the recorded round-6 medians
    # (hint ON 0.77/2.79 s vs OFF 1.26/3.78 s at sf1/sf10) were measured
    # on the v1 layout with the part probe included in both arms.
    li = spark.table(li_t)
    od = spark.table(od_t).select(
        "o_orderkey", F.year("o_orderdate").alias("order_year")
    )
    if hint:
        od = od.hint("shuffle_hash")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("category", "order_year")
        .agg(F.count("*").alias("n_sold"), F.sum("_rev").alias("_rs"))
        .select(
            "category", "order_year", "n_sold",
            (F.expr("(_rs + 50) DIV 100").cast("double") / 100).alias("revenue"),
        )
        .orderBy("category", "order_year")
    )


def main() -> None:
    spark = get_spark()
    for lbl in ("1", "10"):
        sf_dir = f"/root/testdata/sf{lbl}" if lbl != "10" else "/root/repo/benchdata/sf10"
        if lbl == "1":
            sf_dir = "/root/repo/benchdata/sf1"
        base = os.path.join(REPO, "benchdata", f"bucketed2_sf{lbl}")
        li_t, od_t = f"bench_li_b2_{lbl}", f"bench_ord_b2_{lbl}"
        for t, sub, schema, key in (
            (li_t, "li",
             "l_orderkey BIGINT, category STRING, _rev BIGINT",
             "l_orderkey"),
            (od_t, "ord", "o_orderkey BIGINT, o_orderdate TIMESTAMP", "o_orderkey"),
        ):
            loc = f"{base}/{sub}"
            assert os.path.exists(os.path.join(loc, "_SUCCESS")), loc
            if not spark.catalog.tableExists(t):
                spark.sql(
                    f"CREATE TABLE {t} ({schema}) USING PARQUET "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO 32 BUCKETS LOCATION '{loc}'"
                )
        # warm both plans once
        for hint in (False, True):
            q3b(spark, li_t, od_t, sf_dir, hint).collect()
        times: dict[bool, list[float]] = {False: [], True: []}
        for _ in range(REPS):
            for hint in (False, True):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                q3b(spark, li_t, od_t, sf_dir, hint).collect()
                times[hint].append(time.perf_counter() - t0)
        for hint in (False, True):
            ts = times[hint]
            print(
                f"sf{lbl} hint={'ON ' if hint else 'OFF'} "
                f"min={min(ts):.3f} med={statistics.median(ts):.3f} "
                f"all={[round(t, 3) for t in ts]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
