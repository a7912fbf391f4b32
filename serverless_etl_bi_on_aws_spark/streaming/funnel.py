"""Streaming funnel analytics: windowed event aggregation with watermarks.

Extension surface (SURVEY.md §2.9): the reference's funnel analysis is
batch-hourly; the streaming variant keeps the same aggregate shape
(event_type rollups, README.md:102) but over event-time windows with
late-data handling — what the 3-month re-extract approximates in batch,
watermarks do exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def stream_funnel_window_counts(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    fmt: str = "parquet",
) -> DataFrame:
    """File-source stream -> event-time tumbling-window counts per
    event_type. Watermark bounds state: rows later than ``watermark`` are
    dropped, everything else re-aggregates into its window — the streaming
    generalization of the reference's late-tolerant window rewrite
    (README.md:60, 123). Append-mode compatible (finalized windows only).
    """
    stream = getattr(spark.readStream.schema(schema), fmt)(source_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
