"""Raw-q3 slope decomposition (round-6 verdict #8): where does the sf1->sf10
marginal cost go — scan, exchange, join, or aggregate?

q3's slope_ratio vs DuckDB has hovered at ~4-6x while its deployment twin
(q46 over co-bucketed facts) meets the contract; before tuning further, this
measures what the raw plan's slope actually buys, ab_q44_ship.py-style:
cumulative plan prefixes, interleaved (A,B,C,D,E, A,B,...) in ONE session so
this VM's multi-second stall windows hit every arm equally, median-of-N.

Variants (each includes all previous work):
  scan_li   lineitem narrow projection + exact-long revenue expression,
            1-row aggregate — scan + expression + partial-agg floor
  scan_both scan_li + the orders projection (both fact scans, no shuffle)
  exchange  both sides repartitioned on the join key (the orderkey
            exchanges are forced; no join executes)
  join      SHUFFLE_HASH join on orderkey, 1-row aggregate (no broadcast
            side, no category grouping)
  full      the real q3 (+ broadcast part, category x year agg, orderBy)

The per-variant slope is (t_sf10 - t_sf1)/9; successive differences isolate
each stage's marginal cost. DuckDB's q3 slope (the scaling-tier
denominator) is printed alongside for the ratio context.

Result (2026-08-14 run, REPS=7, medians, 8 MB splits, local[32]):

    variant     sf1      sf10     slope/sf  increment
    scan_li     0.135 s  0.327 s  0.0213    0.0213  (scan+expr floor)
    scan_both   0.172 s  0.458 s  0.0318    0.0105  (orders scan)
    exchange    0.601 s  2.591 s  0.2211    0.1893  (orderkey shuffles)
    join        0.538 s  2.921 s  0.2649    0.0438  (hash build+probe)
    full        0.866 s  5.865 s  0.5555    0.2906  (part bcast + agg)
    duckdb q3   0.193 s  0.910 s  0.0797    -       (denominator)

The rung DELTAS attribute the whole measured slope — they sum by
construction and the attribution is the finding:

    scan + revenue expression        0.021 s/sf   ( 4%)
    orders-side scan                 0.011 s/sf   ( 2%)
    orderkey exchanges (both sides)  0.189 s/sf   (34%)
    hash build + probe on orderkey   0.044 s/sf   ( 8%)
    part broadcast probe + cat agg   0.291 s/sf   (52%)
    ------------------------------------------------
    full raw q3                      0.556 s/sf   vs DuckDB 0.080

The scan floor alone is 3.7x BELOW DuckDB's whole-query slope — the gap
is entirely the two join stages, i.e. work DuckDB also does but in
native SIMD pipelines without a shuffle.

Attacks tried, none pay (each measured, interleaved medians, then
REJECTED on the numbers):

  * dictionary-encode the category before the probe, map back after the
    42-row agg (tools/ab_q3_aggkeys.py, round 7): slope 0.507 -> 0.468,
    only ~8% — the final stage's cost is the 2M-entry broadcast map's
    per-row DRAM latency, not string-key width.
  * mid-pipeline pre-aggregation by (l_partkey, order_year) between the
    orderkey join and the part broadcast, shrinking the probe + string
    agg input 60M -> ~14M rows (round 9; counts/long-sums decompose
    exactly, oracle unaffected): slope 0.82 vs 0.50 for the shipped
    plan — the added exchange + 14M-group hash aggregate costs more
    than the probe work it saves, at any scale.
  * the orderkey exchange itself is semantically irreducible per query:
    no per-query rewrite joins 60M lineitem rows to 15M orders without
    co-locating them, which is precisely an INGEST-time decision.

Conclusion — engine floor; the deployment answer is the layouts. The
two dominant rungs (exchange 0.19, probe+agg 0.29 — 86% of the slope)
are the per-query price of joining at read time in a JVM row pipeline;
both per-query rewrites that attack them were measured and rejected.
The engine therefore ships the reference's own move (README.md:113,
materialize the join away) as a LADDER, each rung paying more at ingest
to delete a rung of per-query slope, all oracle-exact:

    raw q3                 slope 0.556 s/sf   ratio ~4-6 vs DuckDB
    q46 bucketed fact      ratio 0.92        (exchange paid at ingest)
    q60 denorm fact        ratio 0.25        (exchange + probe at ingest)
    q47 pricing rollup     ratio 0.13        (everything at ingest)

(BENCH_r09 medians; the denorm fact is incrementally MAINTAINED as of
round 10 — operators/denorm.upsert_sales_denorm — so "pay at ingest" is
an hourly staging merge, not a rebuild.) Raw q3 stays in the scaling
tier as the honest un-materialized number; the contract-meeting paths
are the tiers above. Recorded in SURVEY.md §8.5.
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
SPLIT = 8 << 20  # bench.py's big-tier split sizing


def _li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.floor((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000 + 0.5)
        .alias("_rev"),
    )


def _od(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("order_year")
    )


def scan_li(spark, sf_dir):
    return _li(spark, sf_dir).agg(F.count("*"), F.sum("_rev"))


def scan_both(spark, sf_dir):
    a = _li(spark, sf_dir).agg(
        F.count("*").alias("n"), F.sum("_rev").cast("double").alias("s")
    )
    b = _od(spark, sf_dir).agg(
        F.count("*").alias("n"), F.sum("order_year").cast("double").alias("s")
    )
    return a.unionByName(b)


def exchange(spark, sf_dir):
    a = (
        _li(spark, sf_dir).repartition(F.col("l_orderkey"))
        .agg(F.count("*").alias("n"), F.sum("_rev").cast("double").alias("s"))
    )
    b = (
        _od(spark, sf_dir).repartition(F.col("o_orderkey"))
        .agg(F.count("*").alias("n"), F.sum("order_year").cast("double").alias("s"))
    )
    return a.unionByName(b)


def join(spark, sf_dir):
    li, od = _li(spark, sf_dir), _od(spark, sf_dir)
    return li.join(od.hint("shuffle_hash"), li.l_orderkey == od.o_orderkey).agg(
        F.count("*"), F.sum("_rev"), F.sum("order_year")
    )


def full(spark, sf_dir):
    from serverless_etl_bi_on_aws_spark.plans.queries import QUERIES

    return QUERIES["q3_sales_by_category"](spark, sf_dir)


VARIANTS = [
    ("scan_li", scan_li),
    ("scan_both", scan_both),
    ("exchange", exchange),
    ("join", join),
    ("full", full),
]


def _duckdb_slope() -> None:
    try:
        import duckdb

        from serverless_etl_bi_on_aws_spark.plans.oracles import ORACLE_SQL

        sql = ORACLE_SQL["q3_sales_by_category"]
        out = {}
        for lbl in ("1", "10"):
            con = duckdb.connect()
            d = os.path.join(REPO, "benchdata", f"sf{lbl}")
            for t in ("lineitem", "orders", "part"):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
                )
            con.execute(sql).fetchall()
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                ts.append(time.perf_counter() - t0)
            out[lbl] = min(ts)
            con.close()
        print(
            f"duckdb q3: sf1={out['1']:.3f} sf10={out['10']:.3f} "
            f"slope={(out['10'] - out['1']) / 9.0:.4f}"
        )
    except Exception as ex:  # noqa: BLE001
        print(f"duckdb baseline unavailable: {ex}")


def main() -> None:
    spark = get_spark("ab-q3-floor")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(SPLIT))
    dirs = {
        "1": os.path.join(REPO, "benchdata", "sf1"),
        "10": os.path.join(REPO, "benchdata", "sf10"),
    }
    for d in dirs.values():
        assert os.path.exists(d), f"run bench.py once to build {d}"
    times: dict[tuple[str, str], list[float]] = {}
    for lbl, d in dirs.items():
        for name, fn in VARIANTS:
            fn(spark, d).collect()  # warm plans + IO cache
    for _ in range(REPS):
        for lbl, d in dirs.items():
            for name, fn in VARIANTS:
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                fn(spark, d).collect()
                times.setdefault((lbl, name), []).append(time.perf_counter() - t0)
    prev_slope = 0.0
    print(f"{'variant':<10} {'sf1':>8} {'sf10':>8} {'slope/sf':>9} {'increment':>10}")
    for name, _ in VARIANTS:
        m1 = statistics.median(times[("1", name)])
        m10 = statistics.median(times[("10", name)])
        slope = (m10 - m1) / 9.0
        print(
            f"{name:<10} {m1:>7.3f}s {m10:>7.3f}s {slope:>9.4f} {slope - prev_slope:>10.4f}"
        )
        prev_slope = slope
    _duckdb_slope()
    spark.stop()


if __name__ == "__main__":
    main()
