"""Column-expression library. Everything here returns pyspark Columns built
from ``pyspark.sql.functions`` so expressions stay JVM-side inside
whole-stage codegen — no Python UDFs in the hot path."""

from serverless_etl_bi_on_aws_spark.functions.datetime_fns import (  # noqa: F401
    with_year_month,
    to_ts,
)
from serverless_etl_bi_on_aws_spark.functions.text import (  # noqa: F401
    tokens,
    distinct_tokens,
    shingles,
    token_count,
    quality_score,
)
from serverless_etl_bi_on_aws_spark.functions.vectors import (  # noqa: F401
    dot,
    l2_norm,
    cosine,
)
