"""Incremental load engine: EP1 (README.md:53-76) as one Spark pipeline.

The reference choreographs five services: Data Pipeline extracts hourly
(ST2), S3 object-create events fire a Lambda (ST3), a Glue shell job COPYies
into staging, delete-matches, inserts, truncates (ST4; README.md:67-70).
Structured Streaming's file source *is* steps 2-3's event plumbing — new
files are detected via checkpointed listing (exactly-once per file), and
``foreachBatch`` applies the staging merge transactionally per micro-batch:

    readStream(dir) --AvailableNow/hourly--> foreachBatch(merge_upsert)

Lateness (ST5): the reference tolerates 3 months of late rows by re-
extracting the whole window hourly and relying on the key-merge to dedup;
the same property holds here because the merge is idempotent on keys.

Target-table atomicity: with no transaction-log format in the image (Delta/
Iceberg jars absent), the target is a parquet directory swapped atomically
via rename — the classic write-new-then-swap protocol. At 100 TB deploy the
identical ``foreachBatch`` body over Delta's ``MERGE INTO`` (or pair
``merge_upsert`` with dynamic partition overwrite) instead of a full-dir
swap; the operator algebra is unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from serverless_etl_bi_on_aws_spark.operators.merge import merge_upsert


def backfill(source_df: DataFrame, target_path: str) -> None:
    """ST1 (README.md:55, 141): one-time historical load — plain overwrite
    write of the full extract."""
    source_df.write.mode("overwrite").parquet(target_path)


def merge_into_parquet_target(
    spark: SparkSession,
    staging: DataFrame,
    target_path: str,
    keys: Sequence[str],
    schema_evolution: str = "error",
) -> None:
    """ST4 (README.md:67-70): the 4-step Redshift staging merge against a
    parquet target directory, with write-new-then-swap atomicity.

    Idempotent: re-applying the same staging batch yields a byte-identical
    table (anti-join removes exactly the staged keys each time).
    ``schema_evolution`` is merge_upsert's drift policy ("error" |
    "evolve" | "target") — with "evolve", a source batch that gained a
    column widens the target on this merge (the crawler-re-run semantic,
    README.md:83/127), and one that lost a column null-fills it.
    """
    if not os.path.exists(target_path):
        staging.write.mode("overwrite").parquet(target_path)
        return
    final = spark.read.parquet(target_path)
    merged = merge_upsert(final, staging, keys, schema_evolution=schema_evolution)
    tmp = f"{target_path}.__new__{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{target_path}.__old__{uuid.uuid4().hex[:8]}"
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old, ignore_errors=True)


def merge_into_generation_target(
    spark: SparkSession,
    staging: DataFrame,
    root: str,
    keys: Sequence[str],
    schema_evolution: str = "error",
    keep_n: int = 2,
) -> None:
    """ST4 over the GENERATION+POINTER store (round 16 — the SURVEY §7.1
    convergence): the identical 4-step staging merge, but the target is
    an ``operators/snapshot.py`` generation store instead of an
    in-place-swapped directory. The merged table writes under a
    never-before-visible generation name and the COMMIT is the KB
    pointer marker through ``util.write_marker`` — the one pattern of
    :func:`merge_into_parquet_target` that does NOT translate to an
    object store (in-place rename) is gone; this is the shape the swap
    path converges on at 100 TB (and what Delta/Iceberg MERGE INTO do
    under the hood: new files + a log/pointer commit).

    Extra properties the swap path cannot give:
      * readers that resolved before the merge keep reading their
        (retained, ``keep_n``) generation — no read-under-swap window;
      * a crash anywhere before the pointer write leaves the old
        generation live and the stage as garbage for the next commit's
        sweep — never a half-table;
      * time travel across the last ``keep_n`` merges for free.

    Read the live table with :func:`read_generation_target`. Idempotent
    like the swap variant: re-merging the same staging batch commits a
    content-identical new generation."""
    from serverless_etl_bi_on_aws_spark.operators.snapshot import (
        begin_generation,
        commit_generation,
        resolve_generation,
    )

    cur = resolve_generation(root)
    gen, stage = begin_generation(root)
    data_dir = os.path.join(stage, "data")
    if cur is None:
        staging.write.mode("overwrite").parquet(data_dir)
    else:
        final = spark.read.parquet(os.path.join(cur, "data"))
        merged = merge_upsert(
            final, staging, keys, schema_evolution=schema_evolution
        )
        merged.write.mode("overwrite").parquet(data_dir)
    commit_generation(root, gen, stage, keep_n=keep_n)


def read_generation_target(
    spark: SparkSession, root: str, back: int = 0
) -> DataFrame:
    """Reader half of :func:`merge_into_generation_target`: the live
    generation's table, resolved through the pointer marker.

    ``back=k`` (round 17) time-travels k commits: the pointer marker
    carries the history of previously-live generations, and the newest
    ``keep_n`` of them survive GC — so ``back=1`` under the default
    ``keep_n=2`` reads the table exactly as it was before the last
    merge (the free time-travel property the in-place swap cannot
    give). Raises when ``back`` exceeds the retained history."""
    from serverless_etl_bi_on_aws_spark.operators.snapshot import (
        GEN_POINTER,
        resolve_generation,
    )
    from serverless_etl_bi_on_aws_spark.util import read_marker

    if back < 0:
        raise ValueError(f"back must be >= 0, got {back}")
    if back:
        rec = read_marker(os.path.join(root, GEN_POINTER)) or {}
        history = list(rec.get("history") or [])
        if len(history) < back:
            raise FileNotFoundError(
                f"generation history under {root} holds {len(history)} "
                f"entries; back={back} is not retained"
            )
        return spark.read.parquet(
            os.path.join(root, history[back - 1], "data")
        )
    cur = resolve_generation(root)
    if cur is None:
        raise FileNotFoundError(f"no committed generation under {root}")
    return spark.read.parquet(os.path.join(cur, "data"))


def start_incremental_merge(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    keys: Sequence[str],
    schema: StructType,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str = "1 hour",
    fmt: str = "parquet",
    schema_evolution: str = "error",
    generations: bool = False,
) -> StreamingQuery:
    """ST2+ST3+ST4 in one query: watch ``source_dir`` for new files (the
    Lambda-trigger analog — checkpointed, each file processed exactly once,
    README.md:128's recompute-avoidance for free) and merge every
    micro-batch into the target keyed on ``keys``.

    ``generations=True`` (round 16) routes each micro-batch through
    :func:`merge_into_generation_target` — ``target_path`` becomes a
    generation-store root (read via :func:`read_generation_target`),
    retiring the in-place directory swap: the object-store-correct loop.

    ``available_now=True`` = drain-everything-then-stop (the hourly batch
    cadence, ST2, run from any scheduler); ``False`` = stay up with a
    processing-time trigger.

    Schema drift: a file-source stream's schema is FIXED per query, so an
    evolved landing zone is handled the way the reference handles it —
    re-run the crawler (README.md:83/127) = restart this query with the
    widened ``schema`` and ``schema_evolution="evolve"``; the first merged
    batch then widens the target (pytest-pinned in test_merge_streaming).
    """
    # pathGlobFilter: a landing zone accumulates manifests/notes/_SUCCESS
    # markers; only files of the declared format participate (a stray
    # readme.txt would otherwise fail the whole micro-batch — observed).
    reader = spark.readStream.schema(schema).option("pathGlobFilter", f"*.{fmt}")
    stream = getattr(reader, fmt)(source_dir)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if generations:
            merge_into_generation_target(
                spark, batch_df, target_path, keys,
                schema_evolution=schema_evolution,
            )
        else:
            merge_into_parquet_target(
                spark, batch_df, target_path, keys,
                schema_evolution=schema_evolution,
            )

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def start_rollup_maintenance(
    spark: SparkSession,
    source_dir: str,
    rollup_path: str,
    schema: StructType,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str = "1 hour",
    fmt: str = "parquet",
) -> StreamingQuery:
    """Streaming maintenance of the PRICING ROLLUP layout — the q47/q1
    rung of the ladder kept current from a landing zone of lineitem
    extract files, completing the maintained-layout pair with
    :func:`start_denorm_maintenance`. Each staged file's rows are merged
    into the rollup via ``operators/rollup.upsert_pricing_rollup``:
    exact scaled-long partials re-sum associatively, and only the year
    partitions the delta touches are rewritten.

    Replay caveat — and why markers are PER SOURCE FILE here: unlike the
    denorm upsert (delete-matching on a key, hence idempotent), the
    rollup merge ADDS partials, so re-delivering rows double-counts
    them. foreachBatch is at-least-once AND a wiped checkpoint
    rediscovers every landed file with arbitrary re-BATCHING (two files
    that first arrived as two epochs can replay as one), so neither an
    instance-keyed epoch id (the dedup loops' nonce scheme) nor a
    batch-file-set hash survives; the stable unit of identity is the
    landed FILE. Each micro-batch therefore filters itself to rows from
    files with no `_applied/<md5(file)>` marker, merges only those, and
    writes one marker per file — any re-delivery, in any batching, is
    swallowed.

    Crash SAFETY (round-12; closes the window rounds 10-11 could only
    detect): each batch builds the COMPLETE next rollup generation —
    merged partitions AND the batch's per-file ``_applied`` markers
    together — in a staging dir, and commits it with ONE atomic pointer
    swap (operators/snapshot.py). Data and the record of which files
    produced it are therefore atomic: a crash at ANY point leaves the
    previous generation live with its own markers, and the replay
    recomputes the same next generation from it — double-counting is
    structurally impossible, not merely journaled. Untouched year
    partitions are HARDLINKED from the previous generation, so the
    per-batch cost stays proportional to the delta (the object-store
    analog is manifest reuse — exactly a transactional table format's
    snapshot commit, which is the drop-in at 100 TB). Readers resolve
    the live generation via :func:`rollup_data_path`; the previous
    generation is retained through one further commit so in-flight
    readers finish on a complete immutable tree. A pre-round-12
    in-place rollup is migrated in as generation 1 on its first batch."""
    import os

    from pyspark.sql import functions as F

    from serverless_etl_bi_on_aws_spark.operators.rollup import (
        build_pricing_rollup,
        upsert_pricing_rollup,
    )
    from serverless_etl_bi_on_aws_spark.operators.snapshot import (
        begin_generation,
        commit_generation,
        link_tree,
        resolve_generation,
    )
    from serverless_etl_bi_on_aws_spark.util import marker_exists, write_marker

    reader = spark.readStream.schema(schema).option("pathGlobFilter", f"*.{fmt}")
    stream = getattr(reader, fmt)(source_dir)
    fid = _rollup_file_id

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        with_src = batch_df.withColumn("_src", F.input_file_name())
        files = sorted(r[0] for r in with_src.select("_src").distinct().collect())
        cur = resolve_generation(rollup_path)
        if cur is None and os.path.exists(os.path.join(rollup_path, "_SUCCESS")):
            cur = rollup_path  # legacy in-place layout: its first
            # generational batch links the existing partitions/markers in
        todo = [
            f
            for f in files
            if cur is None
            or not marker_exists(os.path.join(cur, "_applied", fid(f)))
        ]
        if not todo:
            return
        delta = with_src.filter(F.col("_src").isin(todo)).drop("_src")
        gen, stage = begin_generation(rollup_path)
        if cur is None:
            # bootstrap: first unapplied files ARE the rollup
            (
                build_pricing_rollup(delta)
                .repartition(1, "ship_year")
                .write.mode("overwrite")
                .partitionBy("ship_year")
                .parquet(stage)
            )
        else:
            link_tree(cur, stage, exclude_top=("gen-", ".__stage__", "_current"))
            upsert_pricing_rollup(spark, stage, delta)
        for f in todo:
            write_marker(os.path.join(stage, "_applied", fid(f)), {"file": f})
        commit_generation(rollup_path, gen, stage)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def _rollup_file_id(path: str) -> str:
    import hashlib

    return hashlib.md5(path.encode()).hexdigest()[:16]


def rollup_data_path(rollup_path: str) -> str:
    """READER entry point for a maintained rollup: the live committed
    generation under ``rollup_path`` (operators/snapshot.py pointer), or
    ``rollup_path`` itself for a pre-round-12 in-place layout. Always
    read the maintained rollup through this — the root dir holds the
    pointer and generation dirs, not one parquet table."""
    from serverless_etl_bi_on_aws_spark.operators.snapshot import resolve_generation

    return resolve_generation(rollup_path) or rollup_path


def rollup_integrity_status(rollup_path: str) -> dict:
    """Integrity report for a maintained rollup.

    Round-12 generational protocol: partition data and the batch's
    ``_applied`` markers commit together in one atomic generation swap,
    so the rounds-10/11 crash window no longer EXISTS — a crash at any
    point leaves the previous generation live and the replay recomputes;
    stranded ``.__stage__`` dirs are garbage (reported informationally
    as ``stale_stages`` until the next commit sweeps them), never
    partially-applied state.

    Legacy in-place rollups (and legacy journals carried across the
    migration) keep the round-10 detection semantics: a stranded
    ``<rollup>.__journal__/<nonce>.json`` entry names files whose
    additive merge may have committed without markers — checked against
    the LIVE generation's markers, so an entry whose files all carry
    markers (the batch provably committed fully; only the journal
    removal crashed — round-11 ADVICE) is dropped rather than reported
    as permanently dirty.

    Returns ``{"clean": bool, "suspect_files": [...]}`` (+
    ``stale_stages`` when crash leftovers are present); remedy for a
    dirty rollup is a rebuild (it is derived state). Driver-side JSON
    reads only — no Spark job."""
    import glob
    import os

    from serverless_etl_bi_on_aws_spark.operators.snapshot import stale_stages
    from serverless_etl_bi_on_aws_spark.util import marker_exists, read_marker

    live = rollup_data_path(rollup_path)
    suspect: list[str] = []
    for jf in sorted(glob.glob(os.path.join(f"{rollup_path}.__journal__", "*.json"))):
        rec = read_marker(jf)
        files = rec.get("files", []) if rec else []
        if files and all(
            marker_exists(os.path.join(live, "_applied", _rollup_file_id(f)))
            for f in files
        ):
            try:
                os.remove(jf)  # every file marked: the batch fully committed
            except FileNotFoundError:
                pass
            continue
        suspect.extend(files)
    out = {"clean": not suspect, "suspect_files": sorted(set(suspect))}
    stages = stale_stages(rollup_path)
    if stages:
        out["stale_stages"] = stages
    return out


def start_denorm_maintenance(
    spark: SparkSession,
    source_dir: str,
    denorm_path: str,
    part_df: DataFrame,
    schema: StructType,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str = "1 hour",
    fmt: str = "parquet",
) -> StreamingQuery:
    """Streaming maintenance of the DENORMALIZED BI layout — the missing
    last leg of EP1 (round-9 verdict #8): the reference lands hourly
    extracts, staging-merges them into the warehouse, and serves BI from
    PRE-JOINED tables (README.md:67-70, 113, 134-170). This query makes
    that whole path one continuously-running pipeline in one engine:
    every staged file is applied to the order_year-partitioned denorm
    fact via :func:`operators.denorm.upsert_sales_denorm`, so the BI
    query (q60's scan + 42-group aggregate) is always current without
    ever rebuilding the table.

    Staged-file contract: each file carries an order-granular extract
    with columns ``o_orderkey, o_orderdate, l_partkey, l_extendedprice,
    l_discount`` — one row per lineitem of every staged order, a single
    row with NULL line columns for an order staged as deleted. (This
    pre-joined extract shape is the reference's own: its hourly "orders"
    dump IS order+line denormalized, README.md:113.) One file holds ONE
    version of an order; ACROSS files, staged filenames must sort
    lexicographically by staging order (hourly extracts are timestamp-
    named, so they do) — a drained backlog (availableNow after downtime)
    can put two hourly versions of the same order into ONE micro-batch,
    and the batch keeps only each order's rows from its latest file.
    Without that filter, ``dropDuplicates`` would pick an arbitrary
    version's o_orderdate while the lineitem delta unioned BOTH
    versions' rows — silently double-counted revenue (round-10 ADVICE).
    The disambiguation window shuffles only the micro-batch.

    Replay safety needs NO markers here, unlike the ingest-dedup loops:
    ``upsert_sales_denorm`` is delete-matching and therefore idempotent
    per batch (pytest-pinned) — a crash anywhere inside the dynamic
    partition overwrite is repaired by the replay recomputing the same
    touched partitions from whatever mix of old/new partition states
    survived, because the merge result per partition depends only on
    (existing rows minus staged keys) + staged rows.

    At 100 TB each micro-batch touches only the year partitions its
    orders live in; `part` stays a broadcast dim; nothing rescans the
    other years."""
    from pyspark.sql import functions as F

    from serverless_etl_bi_on_aws_spark.operators.denorm import upsert_sales_denorm

    reader = spark.readStream.schema(schema).option("pathGlobFilter", f"*.{fmt}")
    stream = getattr(reader, fmt)(source_dir)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark.sql import Window

        # latest-file-per-order: a backlog drain can batch two staged
        # versions of one order together; only the newest file's rows
        # may contribute (filenames sort by staging order — contract
        # above). Keyed on the source file, not the row values, so an
        # order re-staged UNCHANGED still counts once.
        w = Window.partitionBy("o_orderkey")
        latest = (
            batch_df.withColumn("_src", F.input_file_name())
            .withColumn("_max_src", F.max("_src").over(w))
            .filter(F.col("_src") == F.col("_max_src"))
            .drop("_src", "_max_src")
        )
        delta_orders = latest.select("o_orderkey", "o_orderdate").dropDuplicates(
            ["o_orderkey"]
        )
        delta_li = latest.filter(F.col("l_partkey").isNotNull()).select(
            F.col("o_orderkey").alias("l_orderkey"),
            "l_partkey",
            "l_extendedprice",
            "l_discount",
        )
        upsert_sales_denorm(spark, denorm_path, delta_orders, delta_li, part_df)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
