"""Stream-stream joins: the conversion-attribution shape, live on both
sides.

Extension surface (SURVEY.md §2.9): the reference computes its behavioral
conversions in batch ("viewing but not buying", README.md:102) — q8/q27
are the batch forms. The streaming generalization joins two LIVE event
streams (views ⋈ purchases per user) under watermarks with an event-time
interval condition; Spark buffers each side's unmatched rows as state and
evicts them once the watermark plus the interval bound proves no future
match can arrive — the textbook Structured Streaming stream-stream inner
join.

Scale shape: state is bounded by (watermark + interval) x arrival rate
per side — NOT by stream length; the join itself shuffles both sides on
the equality key (user_id) exactly like the batch join would, and every
executor holds only its key range's buffer. At 100 TB-of-stream the knobs
are the watermark delays (how late data may be) and the interval width
(the attribution window) — both semantic, not tuning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def stream_conversion_join(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    ts_col: str = "ts",
    view_watermark: str = "2 hours",
    buy_watermark: str = "2 hours",
    attribution_window: str = "24 hours",
    fmt: str = "parquet",
) -> DataFrame:
    """view ⋈ purchase conversions on live streams: for every purchase,
    every prior view by the same user within ``attribution_window``.

    One file-source stream filtered into two arms (Spark treats them as
    two stream sides), each watermarked; the join condition is the
    user-id equality plus the event-time interval

        view.ts <= buy.ts AND buy.ts <= view.ts + attribution_window

    which is what lets Spark bound both buffers. Returns one row per
    (view, purchase) pair with the conversion lag in seconds — the
    streaming twin of q27's batch conversion-lag semantics (inner-join
    tier; the aggregate layer on top is the caller's).
    """
    stream = getattr(spark.readStream.schema(schema), fmt)(source_dir)
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col(ts_col).alias("v_ts"),
        )
        .withWatermark("v_ts", view_watermark)
    )
    buys = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("buy_id"),
            F.col(ts_col).alias("b_ts"),
            F.col("value").alias("buy_value"),
        )
        .withWatermark("b_ts", buy_watermark)
    )
    cond = (
        (views.v_user == buys.b_user)
        & (views.v_ts <= buys.b_ts)
        & (buys.b_ts <= views.v_ts + F.expr(f"INTERVAL {attribution_window}"))
    )
    return views.join(buys, cond, "inner").select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "buy_id",
        F.col("buy_value"),
        (F.unix_micros("b_ts") - F.unix_micros("v_ts")).alias("lag_us"),
    )


def batch_conversion_join(
    events: DataFrame, attribution_window: str = "24 hours"
) -> DataFrame:
    """The batch twin of :func:`stream_conversion_join` — identical
    semantics as one DataFrame expression, used by the equality pytest
    (drained stream == this, the q48/q59 discipline)."""
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("buy_value"),
    )
    return (
        views.join(buys, "user_id")
        .filter(
            (F.col("v_ts") <= F.col("b_ts"))
            & (F.col("b_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {attribution_window}"))
        )
        .select(
            "user_id",
            "view_id",
            "buy_id",
            "buy_value",
            (F.unix_micros("b_ts") - F.unix_micros("v_ts")).alias("lag_us"),
        )
    )
