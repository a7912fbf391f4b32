"""Merge-upsert: the heart of the reference's incremental load.

The reference's hourly Glue python-shell job does (README.md:67-70, its own
summary at README.md:70/154):

    1. COPY current CSV from S3 into mysql_dwh_staging.orders
    2. DELETE FROM final WHERE order_id IN (SELECT order_id FROM staging)
    3. INSERT INTO final SELECT * FROM staging
    4. TRUNCATE staging

Steps 2+3 are exactly a delete-matching upsert: staging wins on key
collision, everything else survives. In Spark that is one expression —
``final ANTI-JOIN staging ON keys  UNION ALL  staging`` — no staging table,
no truncate, and it is *idempotent*: replaying the same staging batch yields
the same final table (the reference relies on the same property, "so that we
don't have to worry about the duplicacy", README.md:120).

Scale notes (100 TB final, ~GBs staging per batch): the anti-join shuffles
on the key unless staging is broadcastable — it usually is (one hour of
changes), so we hint ``broadcast(staging_keys)`` below a size threshold and
the whole merge becomes a map-side pass over final. For a partitioned final
table, pair this with :func:`overwrite_changed_partitions` so only
partitions containing staged keys are rewritten (dynamic partition
overwrite), not all 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

#: Below this optimizer-estimated size we broadcast the staging key set; one
#: hourly increment is tiny next to the final table, so the DELETE-matching
#: side of the merge becomes a broadcast anti-join (no shuffle of the big
#: side). A backfill-sized staging set exceeds it and falls back to a
#: shuffled anti-join instead of OOMing executors with a forced broadcast.
BROADCAST_STAGING_MAX_BYTES = 256 << 20


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate — file sizes for file scans,
    exact for local relations; no job is launched. Unknown sources report
    Long.Max and therefore (safely) refuse the broadcast default."""
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def merge_upsert(
    final: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    broadcast_staging: bool | None = None,
    schema_evolution: str = "error",
) -> DataFrame:
    """Delete-matching upsert (README.md:67-70): rows of ``final`` whose key
    appears in ``staging`` are replaced by the staging rows.

    ``schema_evolution`` is the policy for a staging batch whose column set
    drifted from the target — the Spark analog of the reference re-running
    its crawler after a layout change (README.md:83, 127):

      * ``"error"`` (default) — require staging to cover final's columns;
        a drifted batch fails loudly (the pre-round-7 behavior).
      * ``"evolve"`` — output schema is the UNION of both column sets:
        new staging columns appear on the target (null for pre-existing
        rows), columns the source dropped survive (null on the new rows).
        This is the crawler-re-run semantic.
      * ``"target"`` — staging is aligned TO final's schema: missing
        columns null-filled (cast to the target type), extra columns
        dropped. The target never changes shape — the strict-warehouse
        policy.

    Returns ``final``'s column set under ``"error"``/``"target"``, the
    union set under ``"evolve"``. Evolution is pure column algebra — no
    extra shuffle or scan beyond the merge itself.
    """
    key_list = list(keys)
    staging_keys = staging.select(*key_list).dropDuplicates(key_list)
    if broadcast_staging is None:
        broadcast_staging = _estimated_bytes(staging) <= BROADCAST_STAGING_MAX_BYTES
    if broadcast_staging:
        staging_keys = F.broadcast(staging_keys)
    kept = final.join(staging_keys, on=key_list, how="left_anti")
    if schema_evolution == "error":
        return kept.unionByName(staging.select(*final.columns))
    if schema_evolution == "evolve":
        return kept.unionByName(staging, allowMissingColumns=True)
    if schema_evolution == "target":
        staging_cols = set(staging.columns)
        aligned = staging.select(
            *[
                F.col(f.name) if f.name in staging_cols
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in final.schema.fields
            ]
        )
        return kept.unionByName(aligned)
    raise ValueError(f"unknown schema_evolution policy: {schema_evolution!r}")


def staging_table_merge(
    spark,
    incoming: DataFrame,
    staging_table: str,
    final_table: str,
    keys: Sequence[str],
) -> None:
    """The reference's literal 4-step protocol over *catalog tables*
    (README.md:67-70: COPY into staging -> DELETE matching keys from final
    -> INSERT staging -> TRUNCATE staging), for deployments that keep a
    materialized staging table for audit/restart visibility. The pure-
    DataFrame path (:func:`merge_upsert`) is preferred when staging can be
    ephemeral; semantics are identical.
    """
    incoming.write.mode("overwrite").saveAsTable(staging_table)  # step 1 (S9)
    staging = spark.table(staging_table)
    final = spark.table(final_table)
    merged = merge_upsert(final, staging, keys)  # steps 2+3 (J6)
    # The merged plan reads final, so final can't be overwritten in place:
    # write to a swap table, then swap via backup-rename so a crash at any
    # point leaves a recoverable copy of final (either under its own name or
    # as __old) — never a window where the table is dropped and gone.
    swap, backup = f"{final_table}__swap", f"{final_table}__old"
    merged.write.mode("overwrite").saveAsTable(swap)
    spark.sql(f"DROP TABLE IF EXISTS {backup}")  # stale backup from a prior crash
    spark.sql(f"ALTER TABLE {final_table} RENAME TO {backup}")
    spark.sql(f"ALTER TABLE {swap} RENAME TO {final_table}")
    spark.sql(f"DROP TABLE {backup}")
    spark.sql(f"TRUNCATE TABLE {staging_table}")  # step 4 (S10)


def overwrite_changed_partitions(
    merged: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Sink half of the merge for a partitioned final table: with
    ``partitionOverwriteMode=dynamic`` only the partitions present in
    ``merged`` are replaced — the Spark analog of Redshift touching only the
    staged keys rather than rewriting the warehouse."""
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
