"""Measure the DuckDB oracle baseline for the headline queries at any sf dir.

Usage: python tools/duckdb_baseline.py [sf_dir]
Prints one JSON line {"q1": {"cold": s, "warm": s}, ...} — warm is best of
two repeats after a cold run, mirroring BASELINE.md's protocol.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_etl_bi_on_aws_spark.catalog import TABLES
from serverless_etl_bi_on_aws_spark.plans.oracles import EXTRA_ORACLE_SQL, ORACLE_SQL

ORACLE_SQL = {**ORACLE_SQL, **EXTRA_ORACLE_SQL}

HEADLINE = {
    "q1": "q1_pricing_summary",
    "q2": "q2_denorm_customer_orders",
    "q3": "q3_sales_by_category",
    "q4": "q4_funnel_counts",
    "q5": "q5_incremental_window",
    "q6": "q6_topk_cosine",
    "q7": "q7_text_stats",
}


def register(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) and glob.glob(f"{path}/*.parquet") else f"'{path}'"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet({src})")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    register(con, sf_dir)
    out: dict[str, dict[str, float]] = {}
    for short, name in HEADLINE.items():
        sql = ORACLE_SQL[name]
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        cold = time.perf_counter() - t0
        warm = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            warm = min(warm, time.perf_counter() - t0)
        out[short] = {"cold": round(cold, 4), "warm": round(warm, 4)}
    print(json.dumps({"sf_dir": sf_dir, "queries": out,
                      "total_warm": round(sum(v["warm"] for v in out.values()), 4)}))


if __name__ == "__main__":
    main()
