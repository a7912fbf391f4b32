"""Incremental/streaming engine: the Spark re-expression of the reference's
Data Pipeline + Lambda + Glue orchestration (SURVEY.md §2.9 ST1-ST5)."""

from serverless_etl_bi_on_aws_spark.streaming.incremental import (  # noqa: F401
    backfill,
    start_incremental_merge,
    merge_into_parquet_target,
)
from serverless_etl_bi_on_aws_spark.streaming.funnel import (  # noqa: F401
    stream_funnel_window_counts,
)
