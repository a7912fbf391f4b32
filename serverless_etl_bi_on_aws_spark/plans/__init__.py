"""Named analytic queries (the BI views + extension operators) and their
DuckDB oracle SQL. ``QUERIES`` / ``ORACLE_SQL`` are the driver contract."""

from serverless_etl_bi_on_aws_spark.plans.queries import QUERIES  # noqa: F401
from serverless_etl_bi_on_aws_spark.plans.oracles import ORACLE_SQL  # noqa: F401
