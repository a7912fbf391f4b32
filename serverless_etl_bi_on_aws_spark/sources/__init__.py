"""IO layer: the reference's source/sink surface (SURVEY.md §2.1 S1-S10)
re-expressed as thin Spark wrappers — CSV contract, partitioned parquet,
JDBC, dynamic multi-file ingest, and multimodal binary-column plumbing."""

from serverless_etl_bi_on_aws_spark.sources.csv_source import (  # noqa: F401
    read_csv_contract,
    sanitize_invalid_chars,
)
from serverless_etl_bi_on_aws_spark.sources.parquet_io import (  # noqa: F401
    write_partitioned_parquet,
    funnel_file_etl,
)
from serverless_etl_bi_on_aws_spark.sources.ingest import (  # noqa: F401
    ingest_all_files,
    ingest_named_file,
)
from serverless_etl_bi_on_aws_spark.sources.jdbc import jdbc_table  # noqa: F401
from serverless_etl_bi_on_aws_spark.sources.delta_gate import (  # noqa: F401
    delta_available,
    merge_upsert_target,
)
