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
    # local[8] / 8 shuffle partitions (round 19): the suite runs at
    # sf0.001-0.01 where 32 threads only add scheduling overhead, and the
    # driver's own vanilla verification runs local[8] — measured ~9%
    # faster on a representative 50-test subset, no test asserts a core
    # count. TEST-ONLY sizing, like the heap cap below.
    s = get_spark(
        app_name="engine-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "12g",
            # ContextCleaner frees dead shuffle/broadcast/localCheckpoint
            # blocks only after a DRIVER GC; the default forced-GC interval
            # (30min) is longer than the whole suite, so on this container —
            # where spark.local.dir is tmpfs (RAM) — a ~300-test session
            # accumulates dead blocks until the JVM dies (observed twice).
            # TEST-ONLY conf: in round 7 this lived in ENGINE_CONF and the
            # forced full GC every 2min landed inside the bench's multi-
            # second sf10 timed reps, regressing every raw scaling slope
            # in lockstep (q1 1.88->2.28). Keep it here, next to the 12g
            # test heap, never in the shared engine/bench conf.
            "spark.cleaner.periodicGC.interval": "2min",
        },
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
