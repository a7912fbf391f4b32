"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (the reference's
sales-by-category BI view, README.md:100-101) on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented SURVEY.md §2
operator with its DuckDB twin. Implementation lives in
``serverless_etl_bi_on_aws_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serverless_etl_bi_on_aws_spark.plans.oracles import ORACLE_SQL
from serverless_etl_bi_on_aws_spark.plans.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q3_sales_by_category"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query. q13/q14/q18/
    q45 (minhash-LSH / simhash / LSH-ANN / IVF-ANN) are engine-defined by
    design — the driver records the weaker rows-only check and pytest
    cross-validates each against its exact counterpart (q12/q6). q28 and
    q42 were promoted to full value checks in round 3 (sketch tolerances
    exported as expected-TRUE booleans; pixel stats recomputed
    independently in SQL)."""
    return dict(ORACLE_SQL)
