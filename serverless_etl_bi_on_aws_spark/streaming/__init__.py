"""Incremental/streaming engine: the Spark re-expression of the reference's
Data Pipeline + Lambda + Glue orchestration (SURVEY.md §2.9 ST1-ST5)."""

from serverless_etl_bi_on_aws_spark.streaming.incremental import (  # noqa: F401
    backfill,
    start_incremental_merge,
    merge_into_parquet_target,
    start_denorm_maintenance,
    start_rollup_maintenance,
)
from serverless_etl_bi_on_aws_spark.streaming.ingest_dedup import (  # noqa: F401
    apply_afp_dedup_batch,
    apply_curation_batch,
    apply_dedup_batch,
    apply_embedding_dedup_batch,
    apply_image_dedup_batch,
    start_incremental_curation,
    start_incremental_dedup,
)
from serverless_etl_bi_on_aws_spark.streaming.funnel import (  # noqa: F401
    stream_funnel_window_counts,
)
