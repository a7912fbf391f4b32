from __future__ import annotations

import duckdb
import pytest

from serverless_etl_bi_on_aws_spark.catalog import TABLES
from serverless_etl_bi_on_aws_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Cap the test session's driver heap well below the engine default
    # (48g): the suite runs at sf0.001-0.1 and needs nowhere near it, but
    # G1 happily GROWS toward -Xmx instead of collecting, and a ~300-test
    # session was observed twice reaching full heap commitment and then
    # receiving an external TERM mid-suite (SparkShutdownHook stack in the
    # cascade) — consistent with an environment RSS watchdog. A 12g cap
    # keeps the JVM modest and GC honest; the driver's own sweeps use the
    # engine default via SPARK_GRAFT_DRIVER_MEM.
    s = get_spark(
        app_name="engine-tests",
        extra_conf={"spark.driver.memory": "12g"},
    )
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
