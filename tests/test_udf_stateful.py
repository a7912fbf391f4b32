"""X6 UDF surface: pandas twins match JVM expressions; grouped-map and
stateful-streaming operators behave."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.functions.pandas_fns import (
    cosine_to_query_pandas,
    quality_score_pandas,
    zscore_by_group,
)
from serverless_etl_bi_on_aws_spark.functions.text import quality_score
from serverless_etl_bi_on_aws_spark.functions.vectors import cosine
from serverless_etl_bi_on_aws_spark.streaming.stateful import stream_user_running_totals

from tests.conftest import SF_SMOKE


def test_quality_score_pandas_matches_jvm(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    both = docs.select(
        quality_score("text").alias("jvm"), quality_score_pandas("text").alias("py")
    ).collect()
    assert all(abs(r.jvm - r.py) < 1e-12 for r in both)


def test_cosine_pandas_matches_jvm(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qvec = [float(x) for x in emb.select("embedding").head()[0]]
    qcol = F.array(*[F.lit(x) for x in qvec])
    both = emb.select(
        cosine("embedding", qcol).alias("jvm"),
        cosine_to_query_pandas("embedding", qcol).alias("py"),
    ).collect()
    assert all(abs(r.jvm - r.py) < 1e-9 for r in both)


def test_zscore_by_group(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = zscore_by_group(docs.select("lang", "n_chars"), "lang", "n_chars")
    stats = out.groupBy("lang").agg(
        F.round(F.avg("zscore"), 6).alias("mean"), F.round(F.stddev_pop("zscore"), 2).alias("std")
    )
    for r in stats.collect():
        assert abs(r.mean) < 1e-6
        assert abs(r.std - 1.0) < 0.01


def test_stateful_running_totals_across_batches(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    schema = events.schema
    src = tmp_path / "stream"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    half1.coalesce(1).write.parquet(str(src / "b1"))

    def drain(qname):
        # foreachBatch sink: the memory sink can't recover from an existing
        # checkpoint, and checkpoint recovery is exactly what's under test
        out: dict[int, tuple] = {}

        def sink(batch_df, epoch_id):
            for r in batch_df.collect():
                out[r.user_id] = r

        q = (
            stream_user_running_totals(spark, str(src / "*"), schema)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return out

    first = drain("run1")
    exp1 = {r.user_id: r for r in half1.groupBy("user_id").count().collect()}
    assert {u: r.n_events for u, r in first.items()} == {u: r["count"] for u, r in exp1.items()}

    half2.coalesce(1).write.parquet(str(src / "b2"))
    second = drain("run2")
    total = {r.user_id: r["count"] for r in events.groupBy("user_id").count().collect()}
    # state persisted via checkpoint: totals accumulate across query restarts
    assert {u: r.n_events for u, r in second.items()} == total
