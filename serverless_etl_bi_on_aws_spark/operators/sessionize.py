"""Gap-based sessionization of the funnel event stream.

The reference analyzes per-user behavior sequences ("viewing but not
buying", README.md:102) hourly; sessionization is the standard next step for
that analysis. Implemented as window algebra — lag + cumulative sum of
gap-breaks — one shuffle on user_id, no state kept anywhere but the shuffle.
(Streaming variant: ``session_window(ts, gap)`` — see streaming/.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign ``session_id`` (per-user, 1-based) — a new session starts when
    the gap since the previous event exceeds ``gap_minutes``.

    The tiebreak column makes ordering total so results are deterministic
    under equal timestamps.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    new_session = (
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when(gap_us > gap_minutes * 60 * 1_000_000, 1)
        .otherwise(0)
    )
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
