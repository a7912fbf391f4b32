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

Two findings. (1) The orderkey exchanges cost +0.19 s/sf — 2.4x DuckDB's
WHOLE-query slope on their own; that share is irreducible per query (the
semantics need the join) and is exactly what the q46 buckets pay once at
ingest instead. (2) The LARGEST component (+0.29 s/sf, 52%) is the final
stage: probing a 2M-entry broadcast map with STRING p_type values and
hash-aggregating 60M rows on a string key — a cost the bucketed path
pays too. That finding drove tools/ab_q3_aggkeys.py (dictionary-encode
the category to an int id before the probe, map back after the 42-row
aggregate) — measured only ~8% slope (0.507 -> 0.468) and REJECTED: the
cost is the probe's per-row DRAM latency, not key width. What removes it
is not paying it per query: the pre-join denormalized fact
(operators/denorm.py, the reference's own README.md:113 move) measures
slope 0.041 — under DuckDB's whole-query slope — and is the adopted
layer (bench `denorm_q3` tier, EXTRA query q60). The scan floor itself
is 3.7x BELOW DuckDB's whole-query slope — the residual raw-q3 gap is
shuffle + final-stage, not the scan. Recorded in SURVEY.md §8.5.

Round-9 addendum — pre-aggregation rewrite MEASURED AND REJECTED: a
partial rollup by (l_partkey, order_year) between the orderkey join and
the part broadcast (shrinking the probe + string-agg input from 60M to
~14M rows; counts/long-sums decompose exactly so the oracle is
unaffected) measured slope 0.82 s/sf vs 0.50 for the shipped plan
(5 interleaved reps, medians) — the added exchange + 14M-group hash
aggregate costs far more than the probe work it saves. The high-
cardinality mid-aggregate is the same trap at any scale; the adopted
answers remain the ingest-time layouts (bucketed 1.26, denorm 0.37
slope-ratio tiers in BENCH).
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
