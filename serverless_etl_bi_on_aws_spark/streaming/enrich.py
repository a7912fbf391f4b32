"""Stream-static enrichment: the reference's funnel⋈customer join (J4,
README.md:100-102) executed on the LIVE stream side.

A stream-static join is Spark's canonical streaming-enrichment shape: the
static dimension is re-read per micro-batch (always current — a changed
dim file is picked up on the next trigger) and joined stateless-ly, so no
join state accumulates; only the downstream windowed aggregate holds
state, bounded by its watermark. At 100 TB-of-stream the dimension side
is the broadcast candidate exactly as in batch, and the stream side never
shuffles before the aggregate's own keyed exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def stream_enriched_segment_counts(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    customers: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "6 hours",
    watermark: str = "2 hours",
    fmt: str = "parquet",
) -> DataFrame:
    """File-source event stream ⋈ static customer dim -> event-time
    tumbling-window counts per market segment.

    Inner stream-static join: events whose user has no customer row drop
    (the same semantics as the batch J4 inner join), late rows beyond the
    watermark drop, everything else lands in its event-time window."""
    stream = getattr(spark.readStream.schema(schema), fmt)(source_dir)
    dim = customers.select(
        F.col("c_custkey").alias("_ck"), "c_mktsegment"
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .join(dim, stream.user_id == dim._ck)
        .groupBy(F.window(ts_col, window_duration).alias("win"), "c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )
