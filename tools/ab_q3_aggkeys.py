"""Interleaved A/B: q3's final stage — string-keyed agg + string-valued
broadcast probe vs a dictionary-encoded (int) variant.

tools/ab_q3_floor.py decomposed raw q3's sf1->sf10 slope: the orderkey
exchanges cost +0.19 s/sf but the FINAL stage (broadcast part probe +
category x year hash agg) costs +0.29 s/sf — the largest component, and
one the bucketed deployment path (q46) pays too. Hypothesis: the cost is
per-row memory traffic — probing a 2M-entry broadcast map whose values
are p_type STRINGS, then hashing those strings per row in the aggregate.

Variant B dictionary-encodes: a tiny distinct-types frame assigns each
p_type an int id; the broadcast map becomes p_partkey -> tid (int->int),
the 60M-row aggregate groups by (tid, order_year) — fixed-width keys —
and the id is mapped back to the category string AFTER the aggregate (42
rows). Values identical by construction (tid is 1:1 with p_type).

Both arms interleaved in one session, gc before each rep, median-of-N.

Result (2026-08-14, REPS=7): string slope 0.5067, intkey slope 0.4678 —
~8% and slower at sf1 (the extra tiny joins). REJECTED: the final-stage
cost is the probe's per-row DRAM latency on a 2M-entry map, not string
hashing. The adopted answer is the pre-join denormalized layout
(operators/denorm.py, slope 0.041) — don't pay the probe per query.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window, functions as F  # noqa: E402

from serverless_etl_bi_on_aws_spark.catalog import load_table  # noqa: E402
from serverless_etl_bi_on_aws_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("AB_REPS", "7"))
SPLIT = 8 << 20


def _facts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.floor((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000 + 0.5)
        .alias("_rev"),
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("order_year")
    )
    return li, od


def q3_string(spark, sf_dir):
    li, od = _facts(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(od.hint("shuffle_hash"), li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_type").alias("category"), "order_year")
        .agg(F.count("*").alias("n_sold"), F.sum("_rev").alias("_rs"))
        .select(
            "category", "order_year", "n_sold",
            (F.expr("(_rs + 50) DIV 100").cast("double") / 100).alias("revenue"),
        )
        .orderBy("category", "order_year")
    )


def q3_intkey(spark, sf_dir):
    li, od = _facts(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    types = part.select("p_type").distinct().withColumn(
        "_tid", F.row_number().over(Window.orderBy("p_type"))
    )
    pmap = part.join(F.broadcast(types), "p_type").select("p_partkey", "_tid")
    agg = (
        li.join(od.hint("shuffle_hash"), li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(pmap), li.l_partkey == pmap.p_partkey)
        .groupBy("_tid", "order_year")
        .agg(F.count("*").alias("n_sold"), F.sum("_rev").alias("_rs"))
    )
    return (
        agg.join(F.broadcast(types), "_tid")
        .select(
            F.col("p_type").alias("category"), "order_year", "n_sold",
            (F.expr("(_rs + 50) DIV 100").cast("double") / 100).alias("revenue"),
        )
        .orderBy("category", "order_year")
    )


def main() -> None:
    spark = get_spark("ab-q3-aggkeys")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(SPLIT))
    dirs = {
        "1": os.path.join(REPO, "benchdata", "sf1"),
        "10": os.path.join(REPO, "benchdata", "sf10"),
    }
    arms = [("string", q3_string), ("intkey", q3_intkey)]
    # values must agree before timing means anything
    a = [tuple(r) for r in q3_string(spark, dirs["1"]).collect()]
    b = [tuple(r) for r in q3_intkey(spark, dirs["1"]).collect()]
    assert a == b, "variants disagree"
    times: dict[tuple[str, str], list[float]] = {}
    for lbl, d in dirs.items():
        for _, fn in arms:
            fn(spark, d).collect()
    for _ in range(REPS):
        for lbl, d in dirs.items():
            for name, fn in arms:
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                fn(spark, d).collect()
                times.setdefault((lbl, name), []).append(time.perf_counter() - t0)
    for name, _ in arms:
        m1 = statistics.median(times[("1", name)])
        m10 = statistics.median(times[("10", name)])
        print(
            f"{name:<7} sf1 med={m1:.3f} sf10 med={m10:.3f} "
            f"slope={(m10 - m1) / 9.0:.4f} "
            f"all10={[round(t, 2) for t in times[('10', name)]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
