"""Local mirror of the driver's correctness gate: run every oracle-checkable
query in Spark AND DuckDB at sf0.01, compare row count / column names /
order-insensitive values, print one status line per query with timing.

Usage: python tools/compare_oracle.py [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

from serverless_etl_bi_on_aws_spark.catalog import TABLES
from serverless_etl_bi_on_aws_spark.plans.oracles import EXTRA_ORACLE_SQL, ORACLE_SQL
from serverless_etl_bi_on_aws_spark.plans.queries import EXTRA_QUERIES, QUERIES
from serverless_etl_bi_on_aws_spark.session import get_spark

ORACLE_SQL = {**ORACLE_SQL, **EXTRA_ORACLE_SQL}
QUERIES = {**QUERIES, **EXTRA_QUERIES}

import os

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v + 0.0
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # Sort by repr: a deterministic total order even when a column mixes
    # None with values (grouping-set markers) where tuple < would raise.
    return sorted((tuple(canon(r[i]) for i in order) for r in rows), key=repr)


def dtype_drift(scols, stypes, dcols, dtypes):
    """Column-name-matched dtype audit (round-17 verdict #2): the driver's
    hash is serialization-sensitive, but Python value comparison erases
    DuckDB type promotion (HUGEINT SUM, DECIMAL division). Flag any column
    where Spark says LongType/IntegerType and DuckDB says HUGEINT or
    DECIMAL — identical values would still hash differently driver-side."""
    dmap = {c: str(t).upper() for c, t in zip(dcols, dtypes)}
    bad = []
    for c, st in zip(scols, stypes):
        dt = dmap.get(c, "")
        if st in ("bigint", "int", "smallint", "tinyint") and (
            "HUGEINT" in dt or "DECIMAL" in dt
        ):
            bad.append(f"{c}: spark={st} duck={dt}")
    return bad


def main() -> int:
    names = sys.argv[1:] or sorted(ORACLE_SQL)
    spark = get_spark("compare-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, SF)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
            stypes = [f.dataType.simpleString() for f in sdf.schema.fields]
            rel = con.sql(ORACLE_SQL[name])
            dcols, drows = rel.columns, rel.fetchall()
            dt = time.time() - t0
            if sorted(scols) != sorted(dcols):
                print(f"FAIL {name} ({dt:.1f}s): cols spark={sorted(scols)} duck={sorted(dcols)}")
                failures += 1
                continue
            drift = dtype_drift(scols, stypes, dcols, rel.types)
            if drift:
                print(f"FAIL {name} ({dt:.1f}s): dtype drift {drift}")
                failures += 1
                continue
            if len(srows) != len(drows):
                print(f"FAIL {name} ({dt:.1f}s): rows spark={len(srows)} duck={len(drows)}")
                failures += 1
                continue
            s, d = rowset(scols, srows), rowset(dcols, drows)
            bad = [(a, b) for a, b in zip(s, d) if a != b]
            if bad:
                print(f"FAIL {name} ({dt:.1f}s): {len(bad)} row diffs; first: {bad[0]}")
                failures += 1
            else:
                print(f"OK   {name} ({dt:.1f}s, {len(srows)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name} ({time.time()-t0:.1f}s): {type(e).__name__}: {str(e)[:300]}")
            failures += 1
        sys.stdout.flush()
    print(f"== {len(names) - failures}/{len(names)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
