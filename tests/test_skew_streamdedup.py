"""Salted join equivalence on skewed data; streaming dedup across batches;
streaming session windows vs the batch sessionize operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.sessionize import sessionize
from serverless_etl_bi_on_aws_spark.operators.skew import salted_join
from serverless_etl_bi_on_aws_spark.streaming.dedup_stream import (
    stream_dedup,
    stream_session_windows,
)

from tests.conftest import SF_SMOKE


def test_salted_join_row_identical_on_skew(spark):
    # 90% of fact rows share one hot key
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.when(F.rand(7) < 0.9, F.lit(1)).otherwise(F.col("l_partkey")).alias("k"),
        "l_extendedprice",
    )
    dim = load_table(spark, SF_SMOKE, "part").select(
        F.col("p_partkey").alias("k"), "p_type"
    )
    plain = li.join(dim, "k").groupBy("p_type").agg(
        F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s")
    )
    salted = salted_join(li, dim, "k", n_salts=8).groupBy("p_type").agg(
        F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s")
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        (F.col("l_partkey") + 100000).alias("k")
    ).limit(50)
    dim = load_table(spark, SF_SMOKE, "part").select(F.col("p_partkey").alias("k"), "p_type")
    out = salted_join(li, dim, "k", n_salts=4, how="left")
    assert out.count() == 50
    assert out.filter(F.col("p_type").isNotNull()).count() == 0


def test_stream_dedup_across_batches(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").limit(200)
    src = tmp_path / "s"
    src.mkdir()
    ckpt = str(tmp_path / "ck")
    # batch1 = rows, batch2 = the SAME rows (late re-send, README.md:123)
    events.coalesce(1).write.parquet(str(src / "b1"))
    seen: dict[int, int] = {}

    def sink(bdf, eid):
        for r in bdf.collect():
            seen[r.event_id] = seen.get(r.event_id, 0) + 1

    def drain():
        q = (
            stream_dedup(spark, str(src / "*"), events.schema, ["event_id"], delay="90 days")
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    events.coalesce(1).write.parquet(str(src / "b2"))
    drain()
    assert len(seen) == 200
    assert max(seen.values()) == 1, "duplicate keys leaked through the watermark state"


def test_stream_session_windows_match_batch_sessionize(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "es")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    agg = stream_session_windows(spark, src, events.schema, gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("select user_id, count(*) n from sessions_out group by user_id")
    batch = (
        sessionize(events, gap_minutes=30)
        .groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n"))
    )
    s = {r.user_id: r.n for r in streamed.collect()}
    b = {r.user_id: r.n for r in batch.collect()}
    # append mode only emits watermark-closed sessions: everything except
    # sessions touching the final watermark horizon (last day of a 30-day
    # fixture) closes — so per-user counts are bounded above by batch truth
    # and the overall emitted mass is nearly all of it
    assert s, "no sessions emitted"
    for u, n in s.items():
        assert n <= b[u]
    assert sum(s.values()) >= 0.85 * sum(b.values())
