from __future__ import annotations

import duckdb
import pytest

from serverless_etl_bi_on_aws_spark.catalog import TABLES
from serverless_etl_bi_on_aws_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB oracle connection with the same fixture views the driver
    registers (at sf0.01, the correctness tier)."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    yield con
    con.close()
