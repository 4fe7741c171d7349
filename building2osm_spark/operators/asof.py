"""Temporal joins: as-of (nearest at-or-before / at-or-after) and
point-in-interval range joins — the two 1-D analogues of the engine's
spatial cover join, over integer timestamp columns (epoch micros).

The reference's pipeline has no temporal joins (it is batch-snapshot
geospatial), but a training-data pipeline over event/quote streams needs
both, and neither is a built-in Spark operator.

Scale shapes:

- ``asof_join`` is the union+window form: both sides are tagged and
  unioned, ONE shuffle on the join key sorts (ts, side), and
  ``last(payload, ignorenulls)`` over the running frame picks the
  nearest right row for every left row. No join operator at all — a
  sort-merge join would shuffle both sides the same once, then still
  need the per-key scan; this form does the scan inside the window.
  Skew is bounded by per-key row count (same class as sessionize).
- ``interval_join`` is the 1-D binning form of the spatial cover join
  (operators/cover_join.py): intervals explode to the fixed-width
  buckets they cover, points map to their single bucket, and an
  equi-join on (key, bucket) + exact containment filter yields each
  (point, interval) pair exactly once — a point lives in ONE bucket, an
  interval appears at most once per bucket, so no dedup shuffle is
  needed. Interval duplication factor is len/bucket + 1; pick
  ``bucket_us`` near the typical interval length.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _keys(on: Union[str, Sequence[str]]) -> list:
    return [on] if isinstance(on, str) else list(on)


def _check_names(cols, what: str) -> None:
    bad = [c for c in cols if c.startswith("__")]
    if bad:
        raise ValueError(f"{what} columns may not start with '__': {bad}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    *,
    ts_col: str,
    right_ts_col: Optional[str] = None,
    payload: Optional[Sequence[str]] = None,
    direction: str = "backward",
    tolerance_us: Optional[int] = None,
    matched_ts_name: str = "matched_ts_us",
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """For every left row, attach the payload of the nearest right row
    with the same key and ``right.ts <= left.ts`` (direction
    ``'backward'``, at-or-before) or ``right.ts >= left.ts``
    (``'forward'``, at-or-after). Left rows keep all their columns; the
    matched right timestamp lands in ``matched_ts_name`` and each
    `payload` column under its own name (all NULL when nothing matches,
    left-outer semantics). Timestamps must be integer-comparable (derive
    epoch micros first — see operators.sessions). Left rows with NULL
    timestamps match nothing; right rows with NULL timestamps are
    ignored.

    ``tolerance_us`` nulls the match when the time gap exceeds it
    (pandas ``merge_asof`` tolerance). Among right rows sharing
    (key, ts) the one with the greatest ``tiebreak_col`` wins; without a
    tiebreak the winner among exact right-side ts duplicates is
    unspecified — pre-aggregate the right side to unique (key, ts) when
    that matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = _keys(on)
    rts = right_ts_col or ts_col
    if payload is None:
        payload = [c for c in right.columns if c not in set(keys) | {rts}]
    payload = list(payload)
    _check_names(list(left.columns) + list(right.columns), "asof_join input")
    clash = (set(payload) | {matched_ts_name}) & set(left.columns)
    if clash:
        raise ValueError(f"right payload collides with left columns: {sorted(clash)}")
    if matched_ts_name in payload:
        raise ValueError(
            f"matched_ts_name {matched_ts_name!r} collides with a payload column"
        )

    lcols = list(left.columns)
    lpass = [c for c in lcols if c not in keys]

    rstruct = F.struct(
        F.col(rts).cast("long").alias("__ats"),
        *[F.col(c) for c in payload],
    )
    rstruct_type = right.select(rstruct.alias("__r")).schema["__r"].dataType
    tie_expr = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    tie_type = (
        right.select(tie_expr.alias("__tie")).schema["__tie"].dataType
        if tiebreak_col
        else "int"
    )

    r_side = right.where(F.col(rts).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(rts).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        tie_expr.cast(tie_type).alias("__tie"),
        rstruct.alias("__r"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lpass
        ],
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tie_type).alias("__tie"),
        F.lit(None).cast(rstruct_type).alias("__r"),
        *[F.col(c) for c in lpass],
    )
    un = r_side.unionByName(l_side)

    # Ascending ts for backward, descending for forward; rights sort
    # before the left row at equal ts either way (__side 0 < 1), so
    # equality is inclusive; among equal-ts rights the greatest tiebreak
    # sorts last and wins. NULL left ts: asc puts nulls first (no rights
    # precede — no match, as specified); desc puts them last, so the
    # forward path nulls the match explicitly below.
    order = [
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc(),
        F.col("__side").asc(),
        F.col("__tie").asc(),
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched: Column = F.last("__r", ignorenulls=True).over(w)
    if direction == "forward":
        matched = F.when(F.col("__ts").isNotNull(), matched)
    if tolerance_us is not None:
        gap = (
            F.col("__ts") - matched["__ats"]
            if direction == "backward"
            else matched["__ats"] - F.col("__ts")
        )
        matched = F.when(gap <= int(tolerance_us), matched)

    out = un.withColumn("__m", matched).where(F.col("__side") == 1)
    return out.select(
        *[F.col(c) for c in lcols],
        F.col("__m.__ats").alias(matched_ts_name),
        *[F.col(f"__m.{c}").alias(c) for c in payload],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Union[str, Sequence[str]],
    *,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_us: int,
    max_buckets: int = 4096,
) -> DataFrame:
    """Inner-join each point row to every interval row with the same key
    whose closed interval [start, end] contains the point's timestamp.
    All columns from both sides pass through (they must be disjoint
    apart from the key). Timestamps are integer-comparable (epoch
    micros); NULL timestamps/bounds and inverted intervals (end < start)
    match nothing.

    ``bucket_us`` is the binning width: each interval is replicated once
    per covered bucket (len/bucket + 1 copies), each point probes its
    single bucket. Output pairs are exact and unique by construction —
    no post-join distinct. An interval covering more than ``max_buckets``
    buckets fails the job loudly (a single skewed interval at a
    misconfigured bucket_us would otherwise materialize a huge
    per-row array and OOM an executor) — raise ``bucket_us`` (or
    ``max_buckets``, deliberately) instead.
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    keys = _keys(on)
    _check_names(list(points.columns) + list(intervals.columns), "interval_join input")
    clash = (set(points.columns) - set(keys)) & (set(intervals.columns) - set(keys))
    if clash:
        raise ValueError(f"point/interval columns collide: {sorted(clash)}")

    b = int(bucket_us)

    def _bucket(name: str) -> Column:
        # Exact floor division in LONG arithmetic: `/` would compile to
        # a double division (inexact past 2^53 — epoch micros get there
        # within ~3 centuries); subtracting pmod first makes the
        # numerator an exact multiple so SQL `div` (trunc-toward-zero)
        # equals floor even for negative timestamps.
        c = f"cast(`{name}` as bigint)"
        return F.expr(f"({c} - pmod({c}, {b})) div {b}")

    ivals = intervals.where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    )
    # explode_outer, not explode: the guard above guarantees non-empty
    # sequences, and plain explode would push an implicit size()>0
    # filter that re-inlines the generating expression (NOTES fact 23).
    nb = _bucket(end_col) - _bucket(start_col) + 1
    seq = F.when(
        nb > int(max_buckets),
        F.expr(
            f"raise_error(concat('interval_join: an interval covers more than "
            f"{int(max_buckets)} buckets of {b} us — raise bucket_us or max_buckets'))"
        ).cast("array<bigint>"),
    ).otherwise(F.sequence(_bucket(start_col), _bucket(end_col)))
    exploded = ivals.withColumn("__b", F.explode_outer(seq))
    pts = points.where(F.col(ts_col).isNotNull()).withColumn("__b", _bucket(ts_col))
    return (
        pts.join(exploded, [*keys, "__b"])
        .where(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("__b")
    )
