"""SparkSession factory.

The reference tunes its warehouse via Redshift WLM parameter groups and
``search_path`` (README.md:104-107); the Spark analog is session conf.
Defaults here are chosen for the 100 TB design point *shape* (AQE on,
skew-join handling, partition coalescing) while remaining correct on
local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied to every session we build. Values are strings per Spark conf
#: convention. These are safe on a real cluster: AQE re-plans at runtime,
#: coalesces post-shuffle partitions, and splits skewed join partitions —
#: exactly the knobs that matter when one key holds 1% of 100 TB.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # deterministic oracle comparison: DuckDB timestamps are UTC-naive
    "spark.sql.session.timeZone": "UTC",
    # Fixture parquet stores timestamp[us] WITHOUT a timezone; Spark 4.x
    # defaults inferTimestampNTZ=true and reads that as TIMESTAMP_NTZ, which
    # unix_micros()/F.window()/withWatermark() all reject. With the session
    # tz pinned to UTC above, reading it as TIMESTAMP is semantically
    # identical (and matches the DuckDB-naive oracle), so declare it.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Arrow for any pandas_udf / toPandas path (vectorized transfer)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # dims under this size go broadcast-hash without a hint. 16m is sized so
    # dimension tables (part/customer/nation/region at any fixture sf)
    # broadcast while fact tables (orders/lineitem) shuffle: at 64m the sf1
    # orders table (~27 MB) was auto-broadcast — a fact-table broadcast that
    # serializes a 1.5M-row hash build on the driver (measured 2x slower
    # than SMJ locally) and would ship GBs per executor at 100 TB.
    "spark.sql.autoBroadcastJoinThreshold": "16m",
    # partition pruning for the year/month-partitioned funnel sink
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
    # scale hygiene: bound single-task input; on a cluster this keeps tasks
    # ~128MB regardless of file layout
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.compression.codec": "snappy",
    # InferFiltersFromGenerate synthesizes size(arr)>0 before every explode
    # and predicate-pushdown then inlines the array expression into the
    # filter below any repartition — for interpreted higher-order-function
    # arrays (shingles, chunk grids) that re-evaluates the whole pipeline
    # ~3x per row inside the (often 1-task) scan stage. Measured 40% of
    # q13's wall-time; explode drops empty arrays anyway, so the inferred
    # filter only re-derives what Generate already guarantees.
    "spark.sql.optimizer.excludedRules": "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    # Periodic ContextCleaner GC: long sweep sessions on this container's
    # tmpfs spark.local.dir accumulate dead shuffle blocks until the JVM
    # dies (observed round 6). 10min keeps that protection for driver
    # sweeps/long benches without the per-query timing distortion the old
    # 2min interval caused (round-8 bench fix); tests use 2min via
    # conftest where churn is highest.
    "spark.cleaner.periodicGC.interval": "10min",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "serverless-etl-bi-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``shuffle_partitions`` defaults to the local core count — the guide's
    "~cores for local" rule; on a real cluster callers pass
    ``executors * cores * 2-3`` or rely on AQE coalescing from a high value.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    # Shuffle/spill files on tmpfs when available: on this container's
    # overlay filesystem, disk-backed shuffle writes intermittently stall
    # whole stages for 60-90 s (measured on a 42-group aggregate). On a real
    # cluster leave spark.local.dir to the provisioned fast local disks.
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    # keep managed-table/warehouse artifacts out of the repo working dir,
    # and per-process: the in-memory catalog forgets tables between sessions
    # while their files persist, so a shared dir turns every re-run into
    # LOCATION_ALREADY_EXISTS
    builder = builder.config(
        "spark.sql.warehouse.dir",
        os.environ.get("SPARK_GRAFT_WAREHOUSE", f"/tmp/spark-warehouse-{os.getpid()}"),
    )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
