"""Pre-join denormalization — the reference's OWN answer to join cost,
made a first-class write-once operator.

The reference materializes customer⋈orders and orders⋈product into wide
warehouse tables precisely "to avoid joining" at query time and "reduce
the load on CPU" (README.md:29, 113-115); SURVEY.md §4 maps that to a
materialized view, the middle rung of the engine's q3-shaped layout
ladder:

    raw q3        every query pays scan + orderkey exchange + probe + agg
                  (slope decomposition in tools/ab_q3_floor.py: the
                  exchange is +0.19 s/sf, the 2M-entry broadcast probe +
                  string agg +0.29 s/sf — the probe dominates and resists
                  per-query rewrites: dictionary-encoding the category
                  was measured at only ~8% in tools/ab_q3_aggkeys.py)
    q46 buckets   exchange paid once at ingest; probe + agg still per query
    THIS          join AND probe paid once at ingest: the fact is stored
                  as (category, order_year, _rev) — a query is a scan +
                  42-group aggregate. Measured slope 0.041 s/sf at
                  sf1->sf10 vs raw q3's 0.556 and DuckDB's whole-query
                  0.080 — the first q3-shaped layout UNDER the oracle's
                  own marginal cost (bench `denorm_q3` tier)
    q47 rollup    aggregate ALSO paid at ingest (q1's layout; finest rung)

Exactness: `_rev` is the exact scaled-long revenue (q1/q3's scheme), so
the layout cannot move a cent — the denorm query shares q3's verbatim
oracle. At 100 TB the denorm table is the reference's warehouse fact:
partition it by order_year (time-pruned dashboards) and refresh it
incrementally with merge/dynamic-partition-overwrite exactly like
operators/rollup.py maintains the pricing rollup.

Build is digest-keyed write-once (util.fixture_digest): repeated bench /
driver sweeps reuse the first build; a fixture refresh is a cache miss.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.util import artifact_dir, fixture_digest


def build_sales_denorm(spark: SparkSession, sf_dir: str, path: str) -> None:
    """One-time materialization of the denormalized sales fact:
    lineitem ⋈ orders (SHUFFLE_HASH on orderkey) ⋈ part (broadcast),
    projected to exactly the q3 aggregation inputs
    (category, order_year, _rev as exact scaled long)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.floor((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000 + 0.5)
        .alias("_rev"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("order_year")
    )
    part = load_table(spark, sf_dir, "part")
    (
        li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("p_type").alias("category"), "order_year", "_rev")
        .write.mode("overwrite")
        .parquet(path)
    )


def ensure_sales_denorm(spark: SparkSession, sf_dir: str) -> str:
    """Digest-keyed write-once gate around :func:`build_sales_denorm`."""
    digest = fixture_digest(sf_dir, ("lineitem", "orders", "part"))[:8]
    path = artifact_dir(f"spark_graft_denorm_{digest}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_sales_denorm(spark, sf_dir, path)
    return path


def sales_by_category_from_denorm(spark: SparkSession, denorm_path: str) -> DataFrame:
    """q3's semantics served from the denormalized fact: one scan, one
    42-group hash aggregate (map-side partial), the cent rounded
    integer-side exactly as q3/q46 do."""
    return (
        spark.read.parquet(denorm_path)
        .groupBy("category", "order_year")
        .agg(F.count("*").alias("n_sold"), F.sum("_rev").alias("_rs"))
        .select(
            "category",
            "order_year",
            "n_sold",
            (F.expr("(_rs + 50) DIV 100").cast("double") / 100).alias("revenue"),
        )
        .orderBy("category", "order_year")
    )
