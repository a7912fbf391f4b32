"""Sequential shard packing — assign rows to ~fixed-token-budget shards.

The step between chunking and the trainer: stream documents in a stable
order and cut a new shard whenever the running token count crosses the
budget (greedy sequential packing — the scheme TFRecord/WebDataset-style
writers use). Deterministic given the ordering column, so it is exactly
reproducible across engines and runs, unlike randomized bin packing.

Shard id = (tokens accumulated BEFORE this row) div budget: a row that
crosses the boundary still joins the shard it started in, so every shard
except the last holds ≥ budget tokens minus one document's overhang.

Scale: the running sum is a single-partition window — correct but serial.
At 100 TB pack *within* partitions (partition by date/source bucket, same
window per partition) and write one shard family per partition; the global
variant here is the semantic reference for that."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequential(
    df: DataFrame,
    order_col: str,
    size_col: str,
    budget: int,
    partition_by: str | None = None,
) -> DataFrame:
    """Add a ``shard_id`` column: greedy sequential packing of ``size_col``
    units into shards of ~``budget``, in ``order_col`` order.

    ``partition_by`` is the scale path: pack independently within each
    partition value (date, source, language bucket) so the running sum
    parallelizes — shard_id is then local to its partition."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    before = (
        Window.partitionBy(partition_by) if partition_by is not None else Window
    ).orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum(size_col).over(before), F.lit(0))
    return (
        df.withColumn("__cum_before", cum_before)
        .withColumn("shard_id", F.expr(f"__cum_before div {budget}"))
        .drop("__cum_before")
    )


def write_packed_shards(
    df: DataFrame,
    out_dir: str,
    order_col: str,
    size_col: str,
    budget: int,
    partition_by: str | None = None,
) -> DataFrame:
    """Materialize packed shards — the writer half the trainer consumes
    (WebDataset/TFRecord/MDS-style shard layout, expressed as a
    hive-partitioned parquet table plus a manifest).

    Writes under ``out_dir``:
      * ``shards/`` — the input rows PARTITIONED BY shard_id (and by
        ``partition_by`` first when packing per-stratum), so the trainer
        streams one directory per shard and a resume-from-shard-k is
        partition pruning;
      * ``manifest/`` — one row per shard: row count, token sum, min/max
        of ``order_col`` (the replay cursor). A data loader plans epochs
        from the manifest (KB-scale) without listing the corpus.

    Returns the manifest DataFrame (read back from disk, so callers see
    exactly what a consumer would). The write is the packing plan plus
    ONE dynamic-partition write — no extra exchange beyond
    pack_sequential's window; the manifest is a shard-count-sized
    aggregate of the same pass."""
    import os

    packed = pack_sequential(df, order_col, size_col, budget, partition_by)
    part_cols = ([partition_by] if partition_by else []) + ["shard_id"]
    packed.write.mode("overwrite").partitionBy(*part_cols).parquet(
        os.path.join(out_dir, "shards")
    )
    manifest = (
        packed.groupBy(*part_cols)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(size_col).alias("n_tokens"),
            F.min(order_col).alias("first_key"),
            F.max(order_col).alias("last_key"),
        )
    )
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "manifest"))
    return df.sparkSession.read.parquet(os.path.join(out_dir, "manifest"))


def pack_examples(
    df: DataFrame,
    order_col: str,
    size_col: str,
    budget: int,
    partition_by: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """One row PER PACKED TRAINING EXAMPLE — the shard assignment of
    :func:`pack_sequential` pivoted to the shape a trainer consumes:
    ``(shard_id, n_docs, total_tokens, doc_ids)`` with ``doc_ids`` in
    pack order (the attention-boundary/document-mask metadata sequence
    packing needs). Deterministic: members sort by ``order_col`` inside
    the shard (sort_array over structs — no collect_list ordering
    assumptions), so the output is a pure function of the data.

    Scale path is the same as pack_sequential: ``partition_by`` packs
    within partition values and the groupBy inherits that key."""
    packed = pack_sequential(df, order_col, size_col, budget, partition_by)
    id_col = id_col or order_col
    keys = ([partition_by] if partition_by is not None else []) + ["shard_id"]
    return (
        packed.groupBy(*keys)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(size_col).cast("bigint").alias("total_tokens"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col(order_col).alias("o"),
                                F.col(id_col).cast("string").alias("i"),
                            )
                        )
                    ),
                    lambda s: s.getField("i"),
                ),
                ",",
            ).alias("doc_ids"),
        )
    )


def pack_examples_with_offsets(
    df: DataFrame,
    order_col: str,
    size_col: str,
    budget: int,
    partition_by: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """:func:`pack_examples` plus the ``offsets`` column — each member's
    STARTING token position inside its packed example (the exclusive
    prefix sum of member sizes in pack order), comma-joined in the same
    order as ``doc_ids``. This is the piece a training loader actually
    consumes to build block-diagonal attention masks: (offset, size)
    pairs delimit the document boundaries within the concatenated
    sequence; the trailing offset + its size equals ``total_tokens``
    (pinned by test).

    The per-shard cumsum is a transform-with-index over the sorted
    member array (quadratic in members-per-shard — bounded by
    budget/min-doc-size, tens in practice; the array never leaves the
    aggregate row)."""
    packed = pack_sequential(df, order_col, size_col, budget, partition_by)
    id_col = id_col or order_col
    keys = ([partition_by] if partition_by is not None else []) + ["shard_id"]
    members = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("o"),
                F.col(size_col).cast("bigint").alias("s"),
                F.col(id_col).cast("string").alias("i"),
            )
        )
    )
    agg = packed.groupBy(*keys).agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).cast("bigint").alias("total_tokens"),
        members.alias("__m"),
    )
    sizes = F.transform(F.col("__m"), lambda s: s.getField("s"))
    offsets = F.transform(
        sizes,
        lambda x, i: F.aggregate(
            F.slice(sizes, F.lit(1), i),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ),
    )
    return agg.select(
        *keys,
        "n_docs",
        "total_tokens",
        F.array_join(
            F.transform(F.col("__m"), lambda s: s.getField("i")), ","
        ).alias("doc_ids"),
        F.array_join(
            F.transform(offsets, lambda v: v.cast("string")), ","
        ).alias("offsets"),
    )
