"""Pre-join denormalization — the reference's OWN answer to join cost,
made a first-class, INCREMENTALLY MAINTAINED layout.

The reference materializes customer⋈orders and orders⋈product into wide
warehouse tables precisely "to avoid joining" at query time and "reduce
the load on CPU" (README.md:29, 113-115), and keeps those tables current
with the hourly staging merge (README.md:67-70: delete matching keys,
insert the staged batch). SURVEY.md §4 maps that to a materialized view,
the middle rung of the engine's q3-shaped layout ladder:

    raw q3        every query pays scan + orderkey exchange + probe + agg
                  (slope decomposition in tools/ab_q3_floor.py: the
                  exchange is +0.19 s/sf, the 2M-entry broadcast probe +
                  string agg +0.29 s/sf — the probe dominates and resists
                  per-query rewrites: dictionary-encoding the category
                  was measured at only ~8% in tools/ab_q3_aggkeys.py)
    q46 buckets   exchange paid once at ingest; probe + agg still per query
    THIS          join AND probe paid once at ingest: the fact is stored
                  as (o_orderkey, category, order_year, _rev) partitioned
                  by order_year — a query is a (column-pruned) scan + a
                  42-group aggregate, and an ingest batch rewrites ONLY
                  the year partitions its orders touch
                  (:func:`upsert_sales_denorm`)
    q47 rollup    aggregate ALSO paid at ingest (q1's layout; finest rung)

Exactness: `_rev` is the exact scaled-long revenue (q1/q3's scheme), so
the layout cannot move a cent — the denorm query shares q3's verbatim
oracle, and upsert(build(A), B) == build(merge(A, B)) is pytest-pinned
under exact long equality (tests/test_rollup.py).

Maintenance semantics (round-9 verdict #1 — the last rebuild-only
artifact): the staged unit is the ORDER. A staged order replaces ALL of
its prior denorm rows (the reference's delete-matching semantics applied
to the pre-joined fact, README.md:67-70 x README.md:113); an order
staged with no lineitems is thereby deleted. `o_orderkey` is retained in
the fact exactly so this delete-match is expressible — queries never
read the column (columnar scan prunes it), the merge needs it.

100 TB shape per batch: the delta join touches only the batch (part is
broadcast); finding which partitions hold prior versions of the staged
keys is ONE column-pruned scan of `o_orderkey` (+ the dir-derived
partition value) semi-joined against the broadcast staged key set; the
rewrite reads and writes only the touched year partitions via dynamic
partition overwrite. Nothing rescans the other years.

Build is digest-keyed write-once (util.fixture_digest): repeated bench /
driver sweeps reuse the first build; a fixture refresh is a cache miss.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.merge import (
    BROADCAST_STAGING_MAX_BYTES,
    _estimated_bytes,
)
from serverless_etl_bi_on_aws_spark.util import artifact_dir, fixture_digest


def denorm_rows(
    lineitem: DataFrame, orders: DataFrame, part: DataFrame
) -> DataFrame:
    """The denormalized sales fact for ANY slice of (lineitem, orders):
    lineitem ⋈ orders (SHUFFLE_HASH on orderkey) ⋈ part (broadcast),
    projected to (o_orderkey, category, order_year, _rev) with _rev the
    exact scaled-long revenue. Used by both the full build and the
    per-batch delta of :func:`upsert_sales_denorm` — one definition, so
    incremental and rebuild rows are identical by construction."""
    li = lineitem.select(
        "l_orderkey",
        "l_partkey",
        F.floor((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000 + 0.5)
        .alias("_rev"),
    )
    o = orders.select("o_orderkey", F.year("o_orderdate").alias("order_year"))
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("o_orderkey", F.col("p_type").alias("category"), "order_year", "_rev")
    )


def _write_partitioned(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the denorm fact partitioned by ``order_year``, RANGE-split
    on (order_year, o_orderkey): each year's data spreads across
    ~defaultParallelism files instead of one-file-per-year (which was
    measured to cap the scan at one task per row group and tripled the
    bench `denorm_q3` slope), and within-file orderkey clustering gives
    the upsert's key probe footer-stats skipping."""
    n = df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, F.col("order_year"), F.col("o_orderkey"))
        .write.mode(mode)
        .partitionBy("order_year")
        .parquet(path)
    )


def build_sales_denorm(spark: SparkSession, sf_dir: str, path: str) -> None:
    """One-time materialization of the denormalized sales fact,
    partitioned by ``order_year`` — the unit of both incremental
    maintenance (:func:`upsert_sales_denorm` rewrites only touched
    years) and time-range pruning for dashboard queries."""
    _write_partitioned(
        denorm_rows(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "part"),
        ),
        path,
    )


def upsert_sales_denorm(
    spark: SparkSession,
    path: str,
    delta_orders: DataFrame,
    delta_lineitem: DataFrame,
    part: DataFrame,
    broadcast_staging: bool | None = None,
    mutable_years: list[int] | None = None,
) -> None:
    """Incremental maintenance of the denorm fact: the reference's
    staging merge (README.md:67-70) applied to the pre-joined table
    (README.md:113). Every order in ``delta_orders`` REPLACES all of its
    prior denorm rows with rows recomputed from ``delta_lineitem`` (an
    order staged with no lineitems is deleted); only the year partitions
    holding delta rows or prior versions of staged keys are rewritten
    (dynamic partition overwrite), the rest of the table is untouched.

    Associativity pin: upsert(build(A), B) == build(merge_upsert(A, B))
    under exact long sums — including orders that MOVE years (the old
    year's rows are delete-matched, the new year's partition gains them)
    and orders whose removal leaves a year EMPTY (the stale partition
    dir is dropped; dynamic overwrite alone would leave it).

    Same snapshot discipline as upsert_pricing_rollup: the merged plan
    reads the very partitions it overwrites, so it is localCheckpoint'd
    before the write.

    ``mutable_years`` — the 100 TB knob for the old-version search. With
    None (default, always safe) the discovery of which partitions hold
    prior versions of staged keys is one whole-table scan of the
    o_orderkey column; at warehouse scale that is TBs of one column per
    hourly batch. The reference's own load bounds its change horizon —
    it re-extracts only the trailing 3 months and treats older data as
    immutable (README.md:58-59, ST5) — and ``mutable_years`` is that
    contract made explicit: pass the years the source system can still
    mutate and the old-version scan partition-prunes to them. An order
    that changed OUTSIDE the declared horizon would leave stale rows —
    the same staleness the reference accepts for data older than its
    re-extract window; delta rows landing outside the horizon are still
    merged correctly (their years join the touched set regardless)."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # bootstrap: first batch IS the table
        _write_partitioned(denorm_rows(delta_lineitem, delta_orders, part), path)
        return
    delta = denorm_rows(delta_lineitem, delta_orders, part).localCheckpoint(eager=True)
    keys = delta_orders.select("o_orderkey").dropDuplicates(["o_orderkey"])
    if broadcast_staging is None:
        broadcast_staging = _estimated_bytes(delta_orders) <= BROADCAST_STAGING_MAX_BYTES
    if broadcast_staging:
        keys = F.broadcast(keys)

    existing = spark.read.parquet(path)
    # touched years = where delta rows land + where prior versions of the
    # staged keys live. The second term is one scan reading ONLY the
    # o_orderkey column (order_year comes from the dir name) against the
    # broadcast key set — the price of not keeping a key->partition log;
    # mutable_years partition-prunes it to the declared change horizon.
    search = existing
    if mutable_years is not None:
        search = search.filter(F.col("order_year").isin([int(y) for y in mutable_years]))
    years_old = search.join(keys, "o_orderkey").select("order_year")
    years_new = delta.select("order_year")
    years = [int(r[0]) for r in years_old.union(years_new).distinct().collect()]
    if not years:
        return

    merged = (
        existing.filter(F.col("order_year").isin(years))  # partition-pruned read
        .join(keys, "o_orderkey", "left_anti")            # delete matching keys
        .unionByName(delta)                               # insert the staged batch
        .localCheckpoint(eager=True)
    )
    present = {int(r[0]) for r in merged.select("order_year").distinct().collect()}
    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        _write_partitioned(merged, path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)
    # a touched year whose every row belonged to replaced orders emits no
    # merged rows, so dynamic overwrite never visits it — drop the stale dir
    for y in years:
        if y not in present:
            shutil.rmtree(os.path.join(path, f"order_year={y}"), ignore_errors=True)


def ensure_sales_denorm(spark: SparkSession, sf_dir: str) -> str:
    """Digest-keyed write-once gate around :func:`build_sales_denorm`.
    (`denorm3`: the round-10 layout — order_year-partitioned, orderkey
    retained — must not reuse a round-9 flat-layout artifact.)"""
    digest = fixture_digest(sf_dir, ("lineitem", "orders", "part"))[:8]
    path = artifact_dir(f"spark_graft_denorm3_{digest}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_sales_denorm(spark, sf_dir, path)
    return path


def sales_by_category_from_denorm(spark: SparkSession, denorm_path: str) -> DataFrame:
    """q3's semantics served from the denormalized fact: one column-pruned
    scan (category, order_year, _rev — o_orderkey never read), one
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
