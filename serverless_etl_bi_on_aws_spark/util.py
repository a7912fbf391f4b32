"""Small cross-operator DataFrame utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input so CPU-heavy per-row stages (interpreted
    higher-order functions, Python batches) use every core.

    Single-file/single-row-group parquet — the fixture shape — scans as ONE
    task, which serializes everything downstream of it in the same stage
    (measured: the 5k-doc shingle pipeline ran 1-threaded at 2.8 s; 32-way
    it is ~0.2 s). At 100 TB the scan arrives in thousands of splits and
    this is a no-op: the repartition is only applied when the current plan
    has fewer partitions than the target.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
