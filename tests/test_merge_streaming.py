"""Incremental-engine tests (SURVEY.md §5.4 golden pipeline tests):
merge-upsert correctness + idempotence, the streaming file-source merge
(EP1 end-to-end), and the watermarked funnel window aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.merge import merge_upsert
from serverless_etl_bi_on_aws_spark.streaming.funnel import stream_funnel_window_counts
from serverless_etl_bi_on_aws_spark.plans.queries import QUERIES
from serverless_etl_bi_on_aws_spark.streaming.incremental import (
    backfill,
    merge_into_parquet_target,
    start_incremental_merge,
)

from tests.conftest import SF_SMOKE

CUT_HIST = "2001-05-01"
CUT_STAGE = "2001-02-01"  # overlaps history by 3 months (README.md:60 window)


def _split_orders(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    hist = orders.filter(F.col("o_orderdate") < CUT_HIST)
    stage = orders.filter(F.col("o_orderdate") >= CUT_STAGE).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    return orders, hist, stage


def test_merge_upsert_staging_wins_and_counts(spark):
    orders, hist, stage = _split_orders(spark)
    merged = merge_upsert(hist, stage, ["o_orderkey"])
    assert merged.count() == orders.count()  # no dupes, no losses
    # every key in the overlap carries the staged (+1.0) price
    overlap = (
        merged.join(stage.select("o_orderkey"), "o_orderkey")
        .join(
            orders.select("o_orderkey", F.col("o_totalprice").alias("orig")),
            "o_orderkey",
        )
        .filter(F.col("o_totalprice") != F.col("orig") + 1.0)
    )
    assert overlap.count() == 0


def test_merge_upsert_idempotent(spark):
    _, hist, stage = _split_orders(spark)
    once = merge_upsert(hist, stage, ["o_orderkey"])
    twice = merge_upsert(once, stage, ["o_orderkey"])
    assert once.count() == twice.count()
    assert once.exceptAll(twice).count() == 0 and twice.exceptAll(once).count() == 0


def test_parquet_target_merge_roundtrip(spark, tmp_path):
    target = str(tmp_path / "dwh_orders")
    _, hist, stage = _split_orders(spark)
    backfill(hist, target)
    merge_into_parquet_target(spark, stage, target, ["o_orderkey"])
    # materialize before the next merge: the swap protocol replaces the
    # files underneath, so a lazy plan over the old listing would die with
    # FILE_NOT_EXIST (exactly why production pairs this with a snapshotting
    # table format / partition overwrite — documented in incremental.py)
    after = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert len(after) == load_table(spark, SF_SMOKE, "orders").count()
    # replay the same staging batch: identical table (ST4 idempotence)
    merge_into_parquet_target(spark, stage, target, ["o_orderkey"])
    again = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert after == again


def test_staging_table_merge(spark):
    """S9/S10: the catalog-table variant of the 4-step merge — staging is
    materialized, final swapped, staging truncated."""
    from serverless_etl_bi_on_aws_spark.operators.merge import staging_table_merge

    orders, hist, stage = _split_orders(spark)
    spark.sql("DROP TABLE IF EXISTS t_final")
    spark.sql("DROP TABLE IF EXISTS t_staging")
    spark.sql("DROP TABLE IF EXISTS t_final__swap")
    hist.write.mode("overwrite").saveAsTable("t_final")
    staging_table_merge(spark, stage, "t_staging", "t_final", ["o_orderkey"])
    assert spark.table("t_final").count() == orders.count()
    assert spark.table("t_staging").count() == 0  # truncated (S10)
    # staged rows won
    joined = (
        spark.table("t_final")
        .join(stage.select("o_orderkey", F.col("o_totalprice").alias("expect")), "o_orderkey")
        .filter(F.col("o_totalprice") != F.col("expect"))
    )
    assert joined.count() == 0


def test_streaming_file_merge_end_to_end(spark, tmp_path):
    """EP1 as a stream: land historical file -> drain -> land the hourly
    window re-extract -> drain -> target holds exactly the upserted table,
    and a third drain with no new files changes nothing (ST3 exactly-once)."""
    src = tmp_path / "landing"
    src.mkdir()
    target = str(tmp_path / "dwh")
    ckpt = str(tmp_path / "ckpt")
    orders, hist, stage = _split_orders(spark)
    schema = orders.schema

    hist.coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))

    def drain():
        q = start_incremental_merge(
            spark, str(src / "*"), target, ["o_orderkey"], schema, ckpt
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(target).count() == hist.count()

    stage.coalesce(1).write.mode("overwrite").parquet(str(src / "batch2"))
    drain()
    after = spark.read.parquet(target)
    assert after.count() == orders.count()
    staged_keys = {r.o_orderkey for r in stage.select("o_orderkey").collect()}
    sample = after.filter(F.col("o_orderkey").isin(list(staged_keys)[:50])).collect()
    orig = {r.o_orderkey: r.o_totalprice for r in orders.collect()}
    assert all(abs(r.o_totalprice - (orig[r.o_orderkey] + 1.0)) < 1e-9 for r in sample)

    drain()  # no new files -> no change
    assert spark.read.parquet(target).count() == orders.count()


def test_stream_funnel_window_counts(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "events_stream")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    agg = stream_funnel_window_counts(
        spark, src, events.schema, window_duration="1 day", watermark="1 day"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from funnel_out")
    # append mode emits only watermark-finalized windows; compare against
    # the batch equivalent restricted to the same closed windows
    emitted = out.count()
    assert emitted > 0
    batch = (
        events.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    joined = out.join(batch, ["window_start", "event_type"], "inner").filter(
        out.n_events == batch.n_events
    )
    assert joined.count() == emitted  # every emitted window matches batch truth


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Stream-static join (J4 streaming-side): the drained stream⋈customer
    windowed rollup must equal the same computation in batch — inner-join
    drop of unknown users included."""
    from serverless_etl_bi_on_aws_spark.streaming.enrich import (
        stream_enriched_segment_counts,
    )

    events = load_table(spark, SF_SMOKE, "events")
    customers = load_table(spark, SF_SMOKE, "customer")
    src = str(tmp_path / "ev_enrich")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    agg = stream_enriched_segment_counts(
        spark, src, events.schema, customers, window_duration="1 day", watermark="1 day"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = [
        (r.window_start, r.c_mktsegment, r.n_events, r.sum_value)
        for r in spark.sql("select * from enrich_out").collect()
    ]
    batch = (
        events.join(customers, events.user_id == customers.c_custkey)
        .groupBy(F.window("ts", "1 day").alias("win"), "c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("win.start").alias("ws"), "c_mktsegment", "n_events", "sum_value")
    )
    want = [(r.ws, r.c_mktsegment, r.n_events, r.sum_value) for r in batch.collect()]
    assert sorted(out) == sorted(want) and len(out) > 0


def test_merge_schema_evolution_policies(spark):
    """merge_upsert schema drift (round-7 verdict #5): "evolve" widens the
    output to the union schema (new column null-backfilled on old rows,
    dropped column null-filled on new rows); "target" pins the target's
    shape; default "error" still fails loudly."""
    import pytest

    _, hist, stage = _split_orders(spark)
    wider = stage.withColumn("o_channel", F.lit("web"))

    # evolve: union schema, old rows null in the new column
    ev = merge_upsert(hist, wider, ["o_orderkey"], schema_evolution="evolve")
    assert "o_channel" in ev.columns
    staged_keys = wider.select("o_orderkey")
    assert ev.join(staged_keys, "o_orderkey", "left_anti").filter(
        F.col("o_channel").isNotNull()
    ).count() == 0
    assert ev.join(staged_keys, "o_orderkey", "left_semi").filter(
        F.col("o_channel") != "web"
    ).count() == 0

    # evolve with a MISSING source column: survives, null on staged rows
    narrower = stage.drop("o_orderpriority")
    ev2 = merge_upsert(hist, narrower, ["o_orderkey"], schema_evolution="evolve")
    assert "o_orderpriority" in ev2.columns
    assert ev2.filter(F.col("o_orderpriority").isNull()).count() == narrower.count()

    # target: extra column dropped, missing column null-filled, shape fixed
    tg = merge_upsert(hist, wider, ["o_orderkey"], schema_evolution="target")
    assert tg.columns == hist.columns
    tg2 = merge_upsert(hist, narrower, ["o_orderkey"], schema_evolution="target")
    assert tg2.columns == hist.columns
    assert tg2.schema["o_orderpriority"].dataType == hist.schema["o_orderpriority"].dataType

    # default stays loud
    with pytest.raises(Exception):
        merge_upsert(hist, narrower, ["o_orderkey"]).collect()
    with pytest.raises(ValueError):
        merge_upsert(hist, stage, ["o_orderkey"], schema_evolution="bogus")


def test_streaming_merge_schema_evolution_restart(spark, tmp_path):
    """The crawler-re-run semantic end-to-end (round-7 verdict #5): drain a
    stream at schema v1, then land files with a NEW column and restart the
    query with the widened schema + schema_evolution="evolve" — the target
    evolves on the next merge, with v1 rows null in the new column and no
    manual migration of the existing parquet."""
    src = tmp_path / "landing"
    src.mkdir()
    target = str(tmp_path / "dwh")
    ckpt = str(tmp_path / "ckpt")
    orders, hist, stage = _split_orders(spark)

    hist.coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))
    q = start_incremental_merge(
        spark, str(src / "*"), target, ["o_orderkey"], orders.schema, ckpt
    )
    q.awaitTermination(120)
    assert "o_channel" not in spark.read.parquet(target).columns

    wider = stage.withColumn("o_channel", F.lit("web"))
    wider.coalesce(1).write.mode("overwrite").parquet(str(src / "batch2"))
    # restart = the SAME query/checkpoint with the re-crawled (wider)
    # reader schema (README.md:83/127 — the reference re-runs the crawler
    # and the job picks up the new layout); the checkpoint still
    # guarantees batch1 is not re-processed
    q2 = start_incremental_merge(
        spark, str(src / "*"), target, ["o_orderkey"], wider.schema, ckpt,
        schema_evolution="evolve",
    )
    q2.awaitTermination(120)

    after = spark.read.parquet(target)
    assert "o_channel" in after.columns
    assert after.count() == orders.count()
    staged_keys = stage.select("o_orderkey")
    assert after.join(staged_keys, "o_orderkey", "left_semi").filter(
        F.col("o_channel").isNull()
    ).count() == 0
    assert after.join(staged_keys, "o_orderkey", "left_anti").filter(
        F.col("o_channel").isNotNull()
    ).count() == 0


def test_stream_stream_conversion_join_matches_batch(spark, tmp_path):
    """Stream-stream inner join (views ⋈ purchases per user, 24 h
    attribution interval, both sides watermarked): the drained stream
    must produce exactly the batch twin's pairs — state eviction bounded
    by watermark+interval must not drop a legitimate match in an
    AvailableNow drain."""
    from serverless_etl_bi_on_aws_spark.streaming.join import (
        batch_conversion_join,
        stream_conversion_join,
    )

    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "ev_ss")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    joined = stream_conversion_join(
        spark, src, events.schema, attribution_window="24 hours"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.user_id, r.view_id, r.buy_id, r.buy_value, r.lag_us)
        for r in spark.sql("select * from ss_join_out").collect()
    )
    want = sorted(
        (r.user_id, r.view_id, r.buy_id, r.buy_value, r.lag_us)
        for r in batch_conversion_join(events, "24 hours").collect()
    )
    assert got == want and len(got) > 0


def test_streaming_histogram_cells_match_batch_build(spark, tmp_path):
    """Continuous-aggregate maintenance: two file drops drained through
    the cell-maintenance stream produce EXACTLY the cells (and hence the
    quantiles) of a one-shot batch build over all the data; a replay with
    the same checkpoint adds nothing (exactly-once per file)."""
    from serverless_etl_bi_on_aws_spark.operators.histogram import (
        build_histogram_cells,
        histogram_quantiles,
    )
    from serverless_etl_bi_on_aws_spark.streaming.cells import (
        start_histogram_cell_maintenance,
    )

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.to_date("ts")
    )
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "landing"
    src.mkdir()
    cells_path = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = start_histogram_cell_maintenance(
            spark,
            str(src / "*"),
            cells_path,
            events.schema,
            ckpt,
            value_col="value",
            grain=["day", "event_type"],
            bin_width=5.0,
        )
        q.awaitTermination(120)

    half1.coalesce(1).write.mode("overwrite").parquet(str(src / "drop1"))
    drain()
    half2.coalesce(1).write.mode("overwrite").parquet(str(src / "drop2"))
    drain()
    got = {
        (str(r["day"]), r["event_type"], r["bin_id"]): r["n"]
        for r in spark.read.parquet(cells_path).collect()
    }
    want = {
        (str(r["day"]), r["event_type"], r["bin_id"]): r["n"]
        for r in build_histogram_cells(
            events, "value", ["day", "event_type"], 5.0
        ).collect()
    }
    assert got == want
    # replay: nothing new to process, cells unchanged
    drain()
    again = {
        (str(r["day"]), r["event_type"], r["bin_id"]): r["n"]
        for r in spark.read.parquet(cells_path).collect()
    }
    assert again == want
    # quantiles served from the maintained cells == batch quantiles
    maintained = histogram_quantiles(
        spark.read.parquet(cells_path), ["event_type"], 5.0
    )
    direct = histogram_quantiles(
        build_histogram_cells(events, "value", ["event_type"], 5.0),
        ["event_type"],
        5.0,
    )
    key = lambda r: (r["event_type"], r["q_num"], r["q_den"])  # noqa: E731
    a = {key(r): (r["n_total"], r["qbin"]) for r in maintained.collect()}
    b = {key(r): (r["n_total"], r["qbin"]) for r in direct.collect()}
    assert a == b


def test_cell_merge_epoch_replay_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once; the additive cell fold is made
    idempotent per (checkpoint, epoch): re-folding the SAME epoch after
    a simulated crash-between-swap-and-commit changes nothing, the next
    epoch folds normally, and a NEW checkpoint id resets the mark."""
    from serverless_etl_bi_on_aws_spark.streaming.cells import (
        merge_cells_into_parquet,
    )

    cells_path = str(tmp_path / "cells")
    batch = spark.createDataFrame(
        [("A", 0, 3), ("B", 1, 2)], ["event_type", "bin_id", "n"]
    )
    merge_cells_into_parquet(spark, batch, cells_path, ["event_type"],
                             epoch=("ck1", 0))
    once = {(r["event_type"], r["bin_id"]): r["n"]
            for r in spark.read.parquet(cells_path).collect()}
    assert once == {("A", 0): 3, ("B", 1): 2}
    # replayed epoch 0: no double-count
    merge_cells_into_parquet(spark, batch, cells_path, ["event_type"],
                             epoch=("ck1", 0))
    again = {(r["event_type"], r["bin_id"]): r["n"]
             for r in spark.read.parquet(cells_path).collect()}
    assert again == once
    # epoch 1 folds in
    merge_cells_into_parquet(spark, batch, cells_path, ["event_type"],
                             epoch=("ck1", 1))
    two = {(r["event_type"], r["bin_id"]): r["n"]
           for r in spark.read.parquet(cells_path).collect()}
    assert two == {("A", 0): 6, ("B", 1): 4}
    # different checkpoint id: epoch numbering restarts, fold applies
    merge_cells_into_parquet(spark, batch, cells_path, ["event_type"],
                             epoch=("ck2", 0))
    three = {(r["event_type"], r["bin_id"]): r["n"]
             for r in spark.read.parquet(cells_path).collect()}
    assert three == {("A", 0): 9, ("B", 1): 6}


def test_streaming_denorm_maintenance(spark, tmp_path):
    """EP1's last leg (round-9 verdict #8): the denorm BI layout kept
    current by a stream over the landing zone. Land a staged extract of
    20 new orders -> drain -> land a second extract that reprices and
    year-moves one order and deletes another -> drain (same checkpoint:
    file-source exactly-once across restarts) -> the maintained table
    equals a full rebuild over the merged base tables, and a third drain
    with no new files changes nothing."""
    from serverless_etl_bi_on_aws_spark.operators.denorm import (
        denorm_rows,
        upsert_sales_denorm,
    )
    from serverless_etl_bi_on_aws_spark.streaming.incremental import (
        start_denorm_maintenance,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    part = load_table(spark, SF_SMOKE, "part")
    key, lkey = F.col("o_orderkey"), F.col("l_orderkey")
    years = sorted(
        r[0] for r in orders.select(F.year("o_orderdate")).distinct().collect()
    )
    y_new, y_mod = years[-1], years[0]

    k_new = [
        r[0]
        for r in orders.filter(F.year("o_orderdate") == y_new)
        .select("o_orderkey").orderBy("o_orderkey").limit(20).collect()
    ]
    m1, d = (
        r[0]
        for r in orders.filter(F.year("o_orderdate") == y_mod)
        .join(li.select(lkey.alias("o_orderkey")).distinct(), "o_orderkey")
        .select("o_orderkey").orderBy("o_orderkey").limit(2).collect()
    )
    odt = dict(orders.dtypes)["o_orderdate"]
    base_orders = orders.filter(~key.isin(k_new))
    base_li = li.filter(~lkey.isin(k_new))
    mod1 = orders.filter(key == m1).withColumn(
        "o_orderdate", F.add_months("o_orderdate", 13).cast(odt)
    )
    mod1_li = li.filter(lkey == m1).withColumn(
        "l_extendedprice", F.col("l_extendedprice") * 2
    )

    def staged(o_df, l_df):
        lines = l_df.select(
            lkey.alias("o_orderkey"), "l_partkey", "l_extendedprice", "l_discount"
        )
        return o_df.select("o_orderkey", "o_orderdate").join(
            lines, "o_orderkey", "left"
        )

    path = str(tmp_path / "denorm")
    upsert_sales_denorm(spark, path, base_orders, base_li, part)  # bootstrap

    land = tmp_path / "landing"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    f1 = staged(orders.filter(key.isin(k_new)), li.filter(lkey.isin(k_new)))
    f2 = staged(
        mod1.unionByName(orders.filter(key == d)), mod1_li
    )  # d: one NULL-lines row = delete

    def drain():
        q = start_denorm_maintenance(
            spark, str(land / "*"), path, part, f1.schema, ckpt
        )
        q.awaitTermination(120)

    f1.coalesce(1).write.mode("overwrite").parquet(str(land / "extract1"))
    drain()
    cols = ["o_orderkey", "category", "order_year", "_rev"]

    def rows():
        return sorted(tuple(r) for r in spark.read.parquet(path).select(*cols).collect())

    want1 = sorted(tuple(r) for r in denorm_rows(li, orders, part).collect())
    assert rows() == want1  # all fixture orders present after batch 1

    f2.coalesce(1).write.mode("overwrite").parquet(str(land / "extract2"))
    drain()
    exp_orders = orders.filter(key != m1).unionByName(mod1)
    exp_li = li.filter((lkey != m1) & (lkey != d)).unionByName(mod1_li)
    want2 = sorted(tuple(r) for r in denorm_rows(exp_li, exp_orders, part).collect())
    assert rows() == want2

    drain()  # no new files -> no change
    assert rows() == want2


def test_streaming_denorm_two_versions_one_batch(spark, tmp_path):
    """Backlog-drain disambiguation (round-10 ADVICE, medium): TWO staged
    versions of the same order land before a single availableNow drain,
    so both arrive in ONE micro-batch. The maintained fact must reflect
    only the LATEST file's version — the unguarded composition unioned
    both versions' lineitems (double-counted revenue) while picking an
    arbitrary o_orderdate."""
    from serverless_etl_bi_on_aws_spark.operators.denorm import (
        denorm_rows,
        upsert_sales_denorm,
    )
    from serverless_etl_bi_on_aws_spark.streaming.incremental import (
        start_denorm_maintenance,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    part = load_table(spark, SF_SMOKE, "part")
    key, lkey = F.col("o_orderkey"), F.col("l_orderkey")
    m = (
        orders.join(li.select(lkey.alias("o_orderkey")).distinct(), "o_orderkey")
        .select("o_orderkey").orderBy("o_orderkey").head()[0]
    )

    def staged(o_df, l_df):
        lines = l_df.select(
            lkey.alias("o_orderkey"), "l_partkey", "l_extendedprice", "l_discount"
        )
        return o_df.select("o_orderkey", "o_orderdate").join(
            lines, "o_orderkey", "left"
        )

    path = str(tmp_path / "denorm")
    upsert_sales_denorm(
        spark, path, orders.filter(key != m), li.filter(lkey != m), part
    )  # bootstrap without order m

    # v1: order m at original prices; v2: repriced 3x — the truth
    v1 = staged(orders.filter(key == m), li.filter(lkey == m))
    li_v2 = li.filter(lkey == m).withColumn(
        "l_extendedprice", F.col("l_extendedprice") * 3
    )
    v2 = staged(orders.filter(key == m), li_v2)

    land = tmp_path / "landing"
    land.mkdir()
    # hourly-extract naming: lexicographic order == staging order
    v1.coalesce(1).write.mode("overwrite").parquet(str(land / "extract_t01"))
    v2.coalesce(1).write.mode("overwrite").parquet(str(land / "extract_t02"))
    q = start_denorm_maintenance(
        spark, str(land / "*"), path, part, v1.schema, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    cols = ["o_orderkey", "category", "order_year", "_rev"]
    got = sorted(tuple(r) for r in spark.read.parquet(path).select(*cols).collect())
    exp_li = li.filter(lkey != m).unionByName(li_v2)
    want = sorted(tuple(r) for r in denorm_rows(exp_li, orders, part).collect())
    assert got == want


def test_streaming_rollup_maintenance(spark, tmp_path):
    """The q47/q1 rung kept current by a stream: land two lineitem
    extracts -> drain each -> the rollup equals a full build over the
    union and serves q1's exact summary. The additive-merge poison pill
    is pinned: a drain with no new files changes nothing, and — the case
    the content-keyed markers exist for — wiping the CHECKPOINT and
    draining again re-delivers every landed file but must NOT
    double-count the partials."""
    import shutil

    from serverless_etl_bi_on_aws_spark.operators.rollup import (
        build_pricing_rollup,
        pricing_summary_from_rollup,
    )
    from serverless_etl_bi_on_aws_spark.streaming.incremental import (
        rollup_data_path,
        start_rollup_maintenance,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    years = sorted(
        r[0] for r in li.select(F.year("l_shipdate")).distinct().collect()
    )
    split = years[len(years) // 2]
    b1 = li.filter(F.year("l_shipdate") <= split)
    b2 = li.filter(F.year("l_shipdate") > split)

    land = tmp_path / "landing"
    land.mkdir()
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = start_rollup_maintenance(
            spark, str(land / "*"), rollup, li.schema, ckpt
        )
        q.awaitTermination(120)

    def rows():
        live = spark.read.parquet(rollup_data_path(rollup))
        cols = sorted(live.columns)
        return sorted(tuple(r) for r in live.select(*cols).collect())

    b1.coalesce(1).write.mode("overwrite").parquet(str(land / "extract1"))
    drain()
    b2.coalesce(1).write.mode("overwrite").parquet(str(land / "extract2"))
    drain()

    full = build_pricing_rollup(li)
    cols = sorted(full.columns)
    want = sorted(tuple(r) for r in full.select(*cols).collect())
    assert rows() == want

    drain()  # no new files -> no change
    assert rows() == want

    # checkpoint wiped ('reprocess' move): every file re-delivers, the
    # content-keyed markers must swallow them — partials NOT re-added
    shutil.rmtree(ckpt)
    drain()
    assert rows() == want

    # and the maintained rollup serves q1 exactly
    got = pricing_summary_from_rollup(
        spark.read.parquet(rollup_data_path(rollup)), "2001-06-01"
    )
    want_q1 = QUERIES["q1_pricing_summary"](spark, SF_SMOKE)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want_q1.collect()
    )

    # happy-path drains leave no stranded journal entries
    from serverless_etl_bi_on_aws_spark.streaming.incremental import (
        rollup_integrity_status,
    )

    assert rollup_integrity_status(rollup) == {"clean": True, "suspect_files": []}


def test_rollup_stranded_committed_journal_is_cleared(spark, tmp_path):
    """Round-11 ADVICE: a crash AFTER a batch's last _applied marker but
    BEFORE the journal removal strands an entry that no replay clears
    (the early not-todo return exits before cleanup) — yet no double
    count occurred. rollup_integrity_status must drop entries whose
    files ALL carry markers (the batch provably committed fully) rather
    than report the rollup permanently dirty; entries naming an
    UNapplied file still report suspect."""
    import glob as _glob
    import os

    from serverless_etl_bi_on_aws_spark.streaming.incremental import (
        rollup_integrity_status,
        start_rollup_maintenance,
    )
    from serverless_etl_bi_on_aws_spark.util import read_marker, write_marker

    li = load_table(spark, SF_SMOKE, "lineitem")
    land = tmp_path / "landing"
    land.mkdir()
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    li.coalesce(1).write.mode("overwrite").parquet(str(land / "extract1"))
    q = start_rollup_maintenance(spark, str(land / "*"), rollup, li.schema, ckpt)
    q.awaitTermination(120)

    # simulate the tail crash: a stranded journal entry naming exactly
    # the files whose markers all committed (read back from the markers
    # themselves so the path spelling matches input_file_name's)
    from serverless_etl_bi_on_aws_spark.streaming.incremental import rollup_data_path

    applied_files = [
        read_marker(p)["file"]
        for p in _glob.glob(os.path.join(rollup_data_path(rollup), "_applied", "*"))
    ]
    assert applied_files
    jdir = f"{rollup}.__journal__"
    write_marker(os.path.join(jdir, "deadbeef.json"), {"files": applied_files})
    assert rollup_integrity_status(rollup) == {"clean": True, "suspect_files": []}
    assert not _glob.glob(os.path.join(jdir, "*.json"))  # entry dropped

    # an entry naming an unapplied file is a REAL suspect and stays
    write_marker(
        os.path.join(jdir, "dead2.json"), {"files": ["file:///land/extractX"]}
    )
    st = rollup_integrity_status(rollup)
    assert not st["clean"] and st["suspect_files"] == ["file:///land/extractX"]


def test_rollup_crash_window_is_closed(spark, tmp_path, monkeypatch):
    """Round-12 (verdict r11 ask #4): the rollup maintenance crash
    window is CLOSED, not merely detected — each batch's merged
    partitions and per-file markers commit together as one generation
    behind an atomic pointer swap, so a crash at ANY point followed by
    a replay double-counts nothing and rollup_integrity_status reports
    clean across every simulated crash site.

    Crash A: before the batch's first _applied marker (stage built,
    nothing committed). Crash B: after the generation rename but before
    the pointer swap (committed-but-unreferenced orphan)."""
    import os

    import serverless_etl_bi_on_aws_spark.operators.snapshot as snap
    import serverless_etl_bi_on_aws_spark.util as util
    from serverless_etl_bi_on_aws_spark.operators.rollup import build_pricing_rollup
    from serverless_etl_bi_on_aws_spark.operators.snapshot import resolve_generation
    from serverless_etl_bi_on_aws_spark.streaming.incremental import (
        rollup_data_path,
        rollup_integrity_status,
        start_rollup_maintenance,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    years = sorted(
        r[0] for r in li.select(F.year("l_shipdate")).distinct().collect()
    )
    split = years[len(years) // 2]
    b1 = li.filter(F.year("l_shipdate") <= split)
    b2 = li.filter(F.year("l_shipdate") > split)
    land = tmp_path / "landing"
    land.mkdir()
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = start_rollup_maintenance(spark, str(land / "*"), rollup, li.schema, ckpt)
        try:
            q.awaitTermination(120)
        except Exception:  # noqa: BLE001 - injected crashes surface here
            pass

    def rows():
        live = spark.read.parquet(rollup_data_path(rollup))
        cols = sorted(live.columns)
        return sorted(tuple(r) for r in live.select(*cols).collect())

    def want(df):
        full = build_pricing_rollup(df)
        cols = sorted(full.columns)
        return sorted(tuple(r) for r in full.select(*cols).collect())

    # ---- crash A: first _applied marker write fails (stage complete,
    # commit never reached) -> nothing is live, replay is exact
    b1.coalesce(1).write.mode("overwrite").parquet(str(land / "extract1"))
    real_write = util.write_marker

    def crash_on_marker(path, payload=None):
        if "_applied" in path:
            raise RuntimeError("simulated crash before marker commit")
        return real_write(path, payload)

    monkeypatch.setattr(util, "write_marker", crash_on_marker)
    drain()
    monkeypatch.undo()
    assert resolve_generation(rollup) is None  # pointer never moved
    st = rollup_integrity_status(rollup)
    assert st["clean"] and st["suspect_files"] == []
    drain()  # replay
    assert rows() == want(b1)
    assert rollup_integrity_status(rollup)["clean"]

    # ---- crash B: generation renamed into place but the pointer swap
    # fails -> orphan generation, old one stays live; replay is exact
    # and the orphan (which DOES contain the batch's merge) is swept,
    # never double-counted
    b2.coalesce(1).write.mode("overwrite").parquet(str(land / "extract2"))
    real_snap_write = snap.write_marker

    def crash_on_pointer(path, payload=None):
        if path.endswith("_current.json"):
            raise RuntimeError("simulated crash before pointer swap")
        return real_snap_write(path, payload)

    monkeypatch.setattr(snap, "write_marker", crash_on_pointer)
    drain()
    monkeypatch.undo()
    assert rows() == want(b1)  # old generation still live
    assert rollup_integrity_status(rollup)["clean"]
    drain()  # replay
    assert rows() == want(li)  # exact: no double count anywhere
    assert rollup_integrity_status(rollup) == {"clean": True, "suspect_files": []}
    # exactly the live + previous generations remain; orphan swept
    gens = sorted(g for g in os.listdir(rollup) if g.startswith("gen-"))
    assert len(gens) == 2

    # ---- wiped checkpoint after the crashes ('reprocess' move): every
    # file re-delivers; still exact
    import shutil

    shutil.rmtree(ckpt)
    drain()
    assert rows() == want(li)


def test_generation_merge_matches_swap_merge(spark, tmp_path):
    """Round 16 (SURVEY 7.1 convergence): merge_into_generation_target
    is the rename-free twin of the parquet swap merge — same 4-step
    staging-merge semantics, the commit is a pointer marker. Content
    must match the swap path batch-for-batch, replay must be
    idempotent, and a reader resolved BEFORE a merge keeps its
    (retained) generation — the no-read-under-swap property the
    in-place path cannot give."""
    import os

    from serverless_etl_bi_on_aws_spark.operators.snapshot import (
        resolve_generation,
    )
    from serverless_etl_bi_on_aws_spark.streaming.incremental import (
        merge_into_generation_target,
        read_generation_target,
    )

    orders, hist, stage = _split_orders(spark)
    swap_target = str(tmp_path / "swap")
    gen_root = str(tmp_path / "gens")

    merge_into_parquet_target(spark, hist, swap_target, ["o_orderkey"])
    merge_into_generation_target(spark, hist, gen_root, ["o_orderkey"])
    old_gen = resolve_generation(gen_root)
    old_reader = spark.read.parquet(os.path.join(old_gen, "data"))

    merge_into_parquet_target(spark, stage, swap_target, ["o_orderkey"])
    merge_into_generation_target(spark, stage, gen_root, ["o_orderkey"])

    want = sorted(map(repr, spark.read.parquet(swap_target).collect()))
    got = sorted(map(repr, read_generation_target(spark, gen_root).collect()))
    assert got == want
    # the pre-merge reader still resolves its old generation (keep_n=2)
    assert resolve_generation(gen_root) != old_gen
    assert sorted(map(repr, old_reader.collect())) == sorted(
        map(repr, hist.collect())
    )
    # replay idempotence: same staging batch -> content-identical table
    merge_into_generation_target(spark, stage, gen_root, ["o_orderkey"])
    again = sorted(map(repr, read_generation_target(spark, gen_root).collect()))
    assert again == want


def test_read_generation_target_time_travel(spark, tmp_path):
    """Round 17: read_generation_target(back=k) reads the table as of k
    commits ago through the pointer's retained history — back=0 is the
    live table, back=1 under default keep_n=2 is the pre-merge state,
    back beyond retention and negative back fail loudly."""
    import pytest as _pytest

    from serverless_etl_bi_on_aws_spark.streaming.incremental import (
        merge_into_generation_target,
        read_generation_target,
    )

    orders, hist, stage = _split_orders(spark)
    root = str(tmp_path / "gens")
    with _pytest.raises(FileNotFoundError):
        read_generation_target(spark, root)  # nothing committed yet
    merge_into_generation_target(spark, hist, root, ["o_orderkey"])
    with _pytest.raises(FileNotFoundError, match="not retained"):
        read_generation_target(spark, root, back=1)  # no history yet
    merge_into_generation_target(spark, stage, root, ["o_orderkey"])
    live = read_generation_target(spark, root).count()
    past = read_generation_target(spark, root, back=1).count()
    assert past == hist.count() and live >= past
    with _pytest.raises(FileNotFoundError, match="not retained"):
        read_generation_target(spark, root, back=2)  # aged out (keep_n=2)
    with _pytest.raises(ValueError, match="back must"):
        read_generation_target(spark, root, back=-1)


def test_generation_merge_streaming_end_to_end(spark, tmp_path):
    """start_incremental_merge(generations=True): the EP1 loop over the
    generation store — two landed files drain into two merges; the live
    table equals the one-shot merge of both batches."""
    import os

    from serverless_etl_bi_on_aws_spark.streaming.incremental import (
        read_generation_target,
    )

    orders, hist, stage = _split_orders(spark)
    land = tmp_path / "land"
    land.mkdir()
    hist.coalesce(1).write.mode("overwrite").parquet(str(land / "b1"))
    root = str(tmp_path / "gens")
    q = start_incremental_merge(
        spark,
        str(land / "*"),
        root,
        ["o_orderkey"],
        hist.schema,
        str(tmp_path / "ckpt"),
        generations=True,
    )
    q.awaitTermination()
    assert read_generation_target(spark, root).count() == hist.count()
    stage.coalesce(1).write.mode("overwrite").parquet(str(land / "b2"))
    q = start_incremental_merge(
        spark,
        str(land / "*"),
        root,
        ["o_orderkey"],
        hist.schema,
        str(tmp_path / "ckpt"),
        generations=True,
    )
    q.awaitTermination()
    want = sorted(
        map(repr, merge_upsert(hist, stage, ["o_orderkey"]).collect())
    )
    got = sorted(map(repr, read_generation_target(spark, root).collect()))
    assert got == want


def test_generation_cell_fold_matches_swap_fold(spark, tmp_path):
    """Round 16 (SURVEY 7.1 convergence, cells): the generation-backed
    fold is the rename-free twin of merge_cells_into_parquet — same
    epoch-idempotent additive semantics, the commit is a pointer
    marker, the epoch mark rides inside the generation so data and
    mark still commit together."""
    from serverless_etl_bi_on_aws_spark.streaming.cells import (
        merge_cells_into_generations,
        merge_cells_into_parquet,
        read_cells_generation,
    )

    batch = spark.createDataFrame(
        [("A", 0, 3), ("B", 1, 2)], ["event_type", "bin_id", "n"]
    )
    swap = str(tmp_path / "swap")
    root = str(tmp_path / "gens")

    def swap_cells():
        return {
            (r["event_type"], r["bin_id"]): r["n"]
            for r in spark.read.parquet(swap).collect()
        }

    def gen_cells():
        return {
            (r["event_type"], r["bin_id"]): r["n"]
            for r in read_cells_generation(spark, root).collect()
        }

    for ep in (("ck1", 0), ("ck1", 0), ("ck1", 1), ("ck2", 0)):
        merge_cells_into_parquet(spark, batch, swap, ["event_type"], epoch=ep)
        merge_cells_into_generations(spark, batch, root, ["event_type"], epoch=ep)
        assert gen_cells() == swap_cells()
    assert gen_cells() == {("A", 0): 9, ("B", 1): 6}


def test_generation_cell_stream_end_to_end(spark, tmp_path):
    """start_histogram_cell_maintenance(generations=True): drained
    generations-backed cells equal the one-shot batch build."""
    from serverless_etl_bi_on_aws_spark.operators.histogram import (
        build_histogram_cells,
    )
    from serverless_etl_bi_on_aws_spark.streaming.cells import (
        read_cells_generation,
        start_histogram_cell_maintenance,
    )

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.to_date("ts")
    )
    src = tmp_path / "landing"
    src.mkdir()
    root = str(tmp_path / "cellgens")
    ckpt = str(tmp_path / "ckpt")
    events.coalesce(1).write.mode("overwrite").parquet(str(src / "drop1"))
    q = start_histogram_cell_maintenance(
        spark,
        str(src / "*"),
        root,
        events.schema,
        ckpt,
        value_col="value",
        grain=["day", "event_type"],
        bin_width=5.0,
        generations=True,
    )
    q.awaitTermination(120)
    got = {
        (str(r["day"]), r["event_type"], r["bin_id"]): r["n"]
        for r in read_cells_generation(spark, root).collect()
    }
    want = {
        (str(r["day"]), r["event_type"], r["bin_id"]): r["n"]
        for r in build_histogram_cells(
            events, "value", ["day", "event_type"], 5.0
        ).collect()
    }
    assert got == want
