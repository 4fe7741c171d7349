"""Gap-based event sessionization — the classic scalable window
composition (lag -> break flag -> running sum), here as a reusable
operator over the events table shape (event_id, ts, user_id, ...).

Scale shape: ONE shuffle on the user key; the lag and the running-sum
windows share the same (user, ts, id) partitioning + sort, so Catalyst
plans a single Exchange + Sort feeding both Window operators. Timestamps
compare as epoch MICROSECONDS (unix_micros / epoch_us are exact integers
in both engines — no float or truncation semantics to align). Session
identity is (user, session_seq): no global session counter, nothing
driver-side, hot users are bounded by their own event count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(c: Column) -> Column:
    """tz-proof epoch micros of a naive (NTZ) timestamp column: the wall
    time is interpreted AS UTC regardless of the session timezone, so
    the result equals DuckDB's epoch_us(naive) under any session zone —
    see the derivation note inside sessionize()."""
    return F.unix_micros(
        F.from_utc_timestamp(c.cast("timestamp"), F.current_timezone())
    )


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign each event a per-user session index: a new session starts
    at the user's first event and whenever the gap to the previous event
    exceeds `gap_minutes`. Adds `ts_us` (epoch micros) and `session_seq`
    (1-based per user, in time order); all original columns pass through.
    Ties at identical timestamps break deterministically by `id_col`.
    """
    gap_us = int(gap_minutes * 60_000_000)
    w = Window.partitionBy(user_col).orderBy("ts_us", id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts_us").over(w)
    brk: Column = (
        F.when(prev.isNull() | ((F.col("ts_us") - prev) > gap_us), 1)
        .otherwise(0)
        .cast("long")
    )
    # The events table stores naive timestamps (TIMESTAMP_NTZ). Treat the
    # wall time AS UTC regardless of the session timezone: the NTZ->TS
    # cast interprets the wall time in the session zone (instant = wall -
    # offset), and from_utc_timestamp(·, current_timezone()) adds that
    # offset back — so unix_micros equals DuckDB's epoch_us(naive) under
    # ANY session timezone (verified UTC ≡ America/New_York). A bare cast
    # would shift by the session offset. Known edge: a DST-ambiguous wall
    # hour in a DST session zone can shift by the transition amount —
    # pin the session to UTC (session.get_spark does) where that matters.
    ts_us = epoch_us(F.col(ts_col))
    return (
        events.withColumn("ts_us", ts_us)
        .withColumn("__brk", brk)
        .withColumn("session_seq", F.sum("__brk").over(run))
        .drop("__brk")
    )


def session_stats(
    sessions: DataFrame,
    *,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup of a sessionize() frame: event count, start/end
    (epoch micros), duration, and an exact integer value sum (cents —
    float sums are order-dependent; round-to-cents-then-sum is not).
    One aggregation on the (user, session_seq) key, map-side combinable.
    """
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return sessions.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.sum(cents).alias("sum_cents"),
    )
