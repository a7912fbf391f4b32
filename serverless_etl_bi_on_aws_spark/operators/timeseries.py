"""Time-series densification — gap-fill over event streams (round 15).

A BI layer charting "daily activity per segment" needs DENSE series:
a (key, day) grid with explicit zeros for quiet days, not the sparse
frame a groupBy produces (sparse frames make windows, moving averages,
and retention charts silently wrong — a 7-day average over present
rows only is an average over ACTIVE days). This is the resample/
gap-fill primitive; the cohort matrix (q108) and sessionization are
its consumers.

Semantics (closed-form, oracle-replayable): per key, the dense day
range is [min(day), max(day)] of that key's own events (per-key spans,
not the global span — a key that appears in March only gets March
days); missing days carry the fill value (0 for counts). Day
arithmetic runs on DATE-cast values — exact integers in both engines.

Scale shape: one partial-aggregated groupBy for the sparse counts, one
tiny per-key span aggregate, one ``explode(sequence(...))`` over spans
(rows generated = total dense days, the OUTPUT size — nothing bigger),
and one left join keyed identically to the aggregation. No window over
the corpus, no driver-side materialization. Skew note: a single key's
span explodes on one task; for multi-year spans per key, pre-split
spans by month before exploding (documented knob, same trick as
sampling.epoch_mix_repeat's bounded explode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def gap_fill_daily(
    df: DataFrame,
    key: str | Column,
    ts_col: str = "ts",
    out_key: str = "key",
    count_col: str = "n",
) -> DataFrame:
    """Dense per-(key, day) event counts with zero-filled quiet days —
    ``(out_key, day, n)`` covering each key's own [min, max] day span.
    ``key`` may be a column name or an expression (e.g. a bucketing of
    a high-cardinality id)."""
    k = (F.col(key) if isinstance(key, str) else key).alias(out_key)
    day = F.to_date(ts_col).alias("day")
    sparse = df.select(k, day).groupBy(out_key, "day").agg(
        F.count("*").alias(count_col)
    )
    spans = sparse.groupBy(out_key).agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    dense = spans.select(
        out_key,
        F.explode(
            F.sequence("__d0", "__d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    return (
        dense.join(sparse, [out_key, "day"], "left")
        .select(
            out_key,
            "day",
            F.coalesce(F.col(count_col), F.lit(0)).cast("bigint").alias(count_col),
        )
    )


def rolling_daily_stats(
    dense: DataFrame,
    key_col: str = "key",
    day_col: str = "day",
    count_col: str = "n",
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window statistics over a DENSE daily grid (the
    :func:`gap_fill_daily` output — run the gap-fill first: over a
    sparse frame a trailing window silently averages ACTIVE days only,
    the exact bug densification exists to prevent). Appends
    ``roll_sum`` (exact BIGINT) and ``roll_avg_milli`` (1000*sum DIV
    days-in-window — integer thousandths, engine-exact; the leading
    edge divides by the days actually covered, so the first week is an
    honest partial average, not deflated by phantom zeros).

    Scale shape: one window per key ordered by day — rows-between is
    O(1) per row with a sliding frame; the shuffle key is the same
    ``key_col`` the gap-fill already grouped on."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(-(window_days - 1), Window.currentRow)
    )
    covered = F.count(count_col).over(w)
    rsum = F.sum(count_col).over(w).cast("bigint")
    return dense.select(
        key_col,
        day_col,
        count_col,
        rsum.alias("roll_sum"),
        covered.cast("bigint").alias("__covered"),
    ).select(
        key_col,
        day_col,
        count_col,
        "roll_sum",
        F.expr("(roll_sum * 1000) DIV __covered").alias("roll_avg_milli"),
    )
