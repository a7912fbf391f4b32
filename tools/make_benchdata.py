"""Generate sf1 bench fixtures by deterministic 10x upsample of sf0.1.

Round-1 verdict: at sf0.1 every DuckDB baseline query runs in 6-104 ms while
Spark's fixed per-query floor is ~0.2-0.3 s, so the 2x bench contract was
"arithmetically unfalsifiable" — it measured JVM job launch, not plans. sf1
amortizes the floor against ~10x data (lineitem 6M rows) so the ratio
measures plan quality.

Upsample protocol (seed-free, fully deterministic):
  * every non-dim table is replicated 10x; copy c remaps every PK/FK as
    ``key + c * 10_000_000`` so join fan-out, per-key cardinalities and
    group-by distributions are preserved exactly (10x more customers, same
    orders-per-customer — a scale-up, not a blow-up);
  * dims (region, nation) and value/date/text columns are unchanged, so
    group cardinalities (categories, years, languages) stay fixed while row
    counts scale — the realistic 100 TB shape;
  * each copy lands in its own parquet file under ``<table>.parquet/`` so a
    Spark scan starts with >= 10-way file parallelism;
  * ``events.ts`` is cast from ns to us — the sf1 tier exercises the plain
    timestamp path (the driver fixtures keep covering the nanos workaround);
  * documents/embeddings text+vectors are copied verbatim: sf1 deliberately
    contains exact cross-copy duplicates (a realistic dedup corpus for q11;
    the near-dup self-joins q12/q13 are benched at the driver sf where the
    planted-pair density is calibrated).

Output dir default: /root/repo/benchdata/sf1 (gitignored, ~150 MB, ~10 s to
build; bench.py rebuilds it on demand if absent).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.1"
DST_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf1")
COPIES = 10
STRIDE = 10_000_000

#: table -> list of key columns remapped per copy (PKs and FKs share the
#: same stride so referential integrity survives the upsample).
REMAP: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],  # user_id stays inside customer keyspace
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ("region", "nation")


def build(src: str = SRC_DEFAULT, dst: str = DST_DEFAULT, copies: int = COPIES) -> str:
    con = duckdb.connect()
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        out = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(out):
            con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO '{out}' (FORMAT PARQUET)")
    for t, keys in REMAP.items():
        out_dir = os.path.join(dst, f"{t}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchall()]
        for c in range(copies):
            out = os.path.join(out_dir, f"copy{c:02d}.parquet")
            if os.path.exists(out):
                continue
            proj = []
            for col in cols:
                if col in keys:
                    proj.append(f'"{col}" + {c * STRIDE} AS "{col}"')
                elif col == "ts":  # events: ns -> us for the plain-timestamp path
                    proj.append('CAST(ts AS TIMESTAMP) AS ts')
                else:
                    proj.append(f'"{col}"')
            con.execute(
                f"COPY (SELECT {', '.join(proj)} FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{out}' (FORMAT PARQUET)"
            )
    con.close()
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else SRC_DEFAULT
    dst = sys.argv[2] if len(sys.argv) > 2 else DST_DEFAULT
    print("built", build(src, dst))
