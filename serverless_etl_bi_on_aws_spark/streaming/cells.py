"""Streaming maintenance of mergeable cell layouts — continuous-aggregate
upkeep for the histogram rollup (operators/histogram.py), the streaming
sibling of the batch-incremental pricing rollup (operators/rollup.py).

The layout family's defining property — cells merge by summing exact
integer counts — is what makes streaming maintenance trivial: each
micro-batch reduces to its own cells (batch-local groupBy,
micro-batch-sized), then folds into the persisted cell table by key-sum.
The fold is associative, so batch boundaries can never change the result
(pytest-pinned: drained cells == one-shot batch build).

Exactly-once is NOT free here: foreachBatch is at-least-once (the source
checkpoint commits AFTER the sink callback returns), and an additive fold
double-counts a re-delivered micro-batch — unlike the key-idempotent
incremental merge or scd2_apply, which are no-ops on replay. The fold is
therefore made idempotent per epoch: the (checkpoint, epoch_id) of the
last applied micro-batch rides inside the cell table itself
(``_applied_epoch.json``, underscore-prefixed so Spark's reader ignores
it) and moves atomically with the data in the write-new-then-swap rename,
so a crash between swap and checkpoint commit replays the epoch into a
skip, never a double-sum (pytest-pinned: same-epoch re-fold is a no-op).

Target atomicity uses the same write-new-then-swap protocol as
streaming/incremental.py (no transaction-log format in this image). At
100 TB partition the cell table by the time grain and rewrite only the
partitions a batch touches (dynamic partition overwrite — the
rollup.upsert_pricing_rollup pattern); cells are counts, so even the
swap variant only ever rewrites |grain| x occupied-bins rows, not data.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from serverless_etl_bi_on_aws_spark.operators.histogram import build_histogram_cells
from serverless_etl_bi_on_aws_spark.util import read_marker, write_marker


def _applied_epoch(cells_path: str) -> dict | None:
    return read_marker(os.path.join(cells_path, "_applied_epoch.json"))


def merge_cells_into_parquet(
    spark: SparkSession,
    batch_cells: DataFrame,
    cells_path: str,
    grain: Sequence[str],
    epoch: tuple[str, int] | None = None,
) -> None:
    """Fold batch-local cells into the persisted cell table: union +
    key-sum + atomic swap. Cell-sized work end to end.

    ``epoch`` = (checkpoint id, epoch_id) makes the additive fold
    idempotent under foreachBatch's at-least-once replay: an epoch at or
    below the table's recorded high-water mark (same checkpoint) is
    skipped. The marker is written INTO the new table directory before
    the swap, so data and mark commit in one atomic rename. A different
    checkpoint id resets the mark — epoch ids restart at 0 per
    checkpoint, so cross-checkpoint comparison would be meaningless."""
    if epoch is not None:
        last = _applied_epoch(cells_path)
        if (
            last is not None
            and last.get("ckpt") == epoch[0]
            and epoch[1] <= last.get("epoch", -1)
        ):
            return  # re-delivered micro-batch: already folded in
    if os.path.exists(cells_path):
        existing = spark.read.parquet(cells_path)
        merged = (
            existing.unionByName(batch_cells)
            .groupBy(*grain, "bin_id")
            .agg(F.sum("n").alias("n"))
        )
    else:
        merged = batch_cells
    tmp = f"{cells_path}.__new__{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    if epoch is not None:
        write_marker(
            os.path.join(tmp, "_applied_epoch.json"),
            {"ckpt": epoch[0], "epoch": epoch[1]},
        )
    if os.path.exists(cells_path):
        old = f"{cells_path}.__old__{uuid.uuid4().hex[:8]}"
        os.rename(cells_path, old)
        os.rename(tmp, cells_path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp, cells_path)


def start_histogram_cell_maintenance(
    spark: SparkSession,
    source_dir: str,
    cells_path: str,
    schema: StructType,
    checkpoint_dir: str,
    value_col: str,
    grain: Sequence[str],
    bin_width: float,
    available_now: bool = True,
    processing_time: str = "1 hour",
) -> StreamingQuery:
    """Watch ``source_dir`` for new event files and keep the histogram
    cell table current: every micro-batch reduces to its own cells and
    key-sums into ``cells_path``. Drain with ``available_now`` for the
    scheduled-batch cadence, or leave running with a processing-time
    trigger. Quantile reads (histogram_quantiles) hit only the cell
    table — never the raw stream history."""
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(source_dir)
    )

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_cells = build_histogram_cells(batch_df, value_col, grain, bin_width)
        merge_cells_into_parquet(
            spark, batch_cells, cells_path, grain, epoch=(checkpoint_dir, epoch_id)
        )

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
