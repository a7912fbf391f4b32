"""SCD Type 2 — slowly-changing-dimension history maintenance.

The reference's warehouse merge (README.md:67-70) is Type 1: the staged
row REPLACES the old one and history is gone. The standard warehouse
answer when history matters is Type 2 (Kimball): every change CLOSES the
current version (``valid_to = batch_ts``) and INSERTS a new open one, so
any past state reconstructs with ``valid_from <= t < valid_to``.

``scd2_apply`` is one full-outer join between the OPEN slice of the
dimension and the update batch, classified by null-safe attribute
equality (same discipline as operators/diff.py):

    unchanged / dim-only open rows  -> kept as-is
    changed keys                    -> old version closed + new version
    new keys                        -> new open version
    closed history                  -> untouched (unioned back verbatim)

Scale shape: the closed history never joins — only the open slice (one
row per live key) shuffles against the batch. Determinism: ``batch_ts``
is caller-supplied (never wall-clock), so replaying a batch sequence
reproduces the table bit-for-bit; applying the SAME batch twice is a
no-op (nothing differs the second time) — both pytest-pinned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: SCD2 bookkeeping columns appended to the caller's key+attr schema.
SCD_COLS = ("valid_from", "valid_to", "is_current")


def _ts(x) -> Column:
    """Caller-supplied instant: a Column (e.g. ``F.timestamp_micros`` for
    a session-TZ-independent epoch literal) or a literal castable to
    timestamp. NEVER wall-clock — replay determinism depends on it."""
    return x if isinstance(x, Column) else F.lit(x).cast("timestamp")


def scd2_init(snapshot: DataFrame, valid_from) -> DataFrame:
    """Bootstrap a dimension: every snapshot row becomes an open version."""
    return snapshot.select(
        "*",
        _ts(valid_from).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    batch_ts,
) -> DataFrame:
    """Apply an update batch effective at ``batch_ts``; returns the new
    dimension table (same schema: keys + attrs + SCD_COLS)."""
    attr_cols = [c for c in updates.columns if c not in keys]
    open_rows = dim.filter(F.col("is_current"))
    closed_rows = dim.filter(~F.col("is_current"))

    c = open_rows.select(
        *keys,
        F.struct(*attr_cols).alias("__c_attrs"),
        "valid_from",
        F.lit(1).alias("__in_c"),
    )
    u = updates.select(
        *keys, F.struct(*attr_cols).alias("__u_attrs"), F.lit(1).alias("__in_u")
    )
    j = c.join(u, list(keys), "full_outer")
    changed = (
        F.col("__in_c").isNotNull()
        & F.col("__in_u").isNotNull()
        & ~F.col("__c_attrs").eqNullSafe(F.col("__u_attrs"))
    )
    is_new = F.col("__in_c").isNull()

    keep_open = j.filter(~changed & ~is_new).select(
        *keys,
        *[F.col(f"__c_attrs.{a}").alias(a) for a in attr_cols],
        "valid_from",
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    close_old = j.filter(changed).select(
        *keys,
        *[F.col(f"__c_attrs.{a}").alias(a) for a in attr_cols],
        "valid_from",
        _ts(batch_ts).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    new_versions = j.filter(changed | is_new).select(
        *keys,
        *[F.col(f"__u_attrs.{a}").alias(a) for a in attr_cols],
        _ts(batch_ts).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    ordered = [*keys, *attr_cols, *SCD_COLS]
    return (
        closed_rows.select(*ordered)
        .unionByName(keep_open.select(*ordered))
        .unionByName(close_old.select(*ordered))
        .unionByName(new_versions.select(*ordered))
    )


def scd2_as_of(dim: DataFrame, t) -> DataFrame:
    """Reconstruct the dimension as of time ``t`` — the read that Type 2
    exists for: ``valid_from <= t < coalesce(valid_to, infinity)``."""
    ts = _ts(t)
    return dim.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    ).drop(*SCD_COLS)
