"""Corpus reporting: exact per-group percentiles and fixed-width
histograms over an integer measure (token counts, document lengths,
session durations). The reference pipeline reports plain counts
(building_progress.py's municipality metrics); a training-data pipeline
additionally needs distribution reporting, and Spark's built-in
percentile_approx is (by design) not exactly reproducible across
engines — these forms are.

Scale shapes:

- ``group_percentiles`` pre-aggregates to per-(group, value) counts —
  map-side combinable, so the shuffle carries one row per DISTINCT
  value per group (token counts: thousands of distinct values against
  billions of rows), then a window over those distinct rows computes
  cumulative counts and each requested quantile picks the first value
  whose cumulative count reaches ceil(n·q). Rank targets are computed
  in INTEGER arithmetic from rational q (num/den) — ``ceil(n*num/den)
  = (n*num + den - 1) div den`` — because ``n * 0.9`` as a double can
  land on either side of an integer boundary depending on the engine.
  This is the type-1 (lower) empirical quantile: for q=0.5 on an even
  n it takes the lower middle value, exactly and deterministically.
- ``group_histogram`` is one map-combinable aggregation on
  (group, bucket); bucket index uses the same exact LONG div as
  interval_join.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .asof import _check_names


def _rational(q: Union[float, str, Tuple[int, int]]) -> Tuple[int, int]:
    """Normalize a quantile spec to an exact (num, den) pair. Floats go
    through their shortest decimal repr (0.9 means 9/10, not the binary
    double below it)."""
    if isinstance(q, tuple):
        num, den = q
    else:
        frac = Fraction(str(q) if isinstance(q, float) else q)
        num, den = frac.numerator, frac.denominator
    if not (0 < num <= den):
        raise ValueError(f"quantile must be in (0, 1], got {q!r}")
    return int(num), int(den)


def group_percentiles(
    df: DataFrame,
    group_cols: Union[str, Sequence[str]],
    value_col: str,
    quantiles: Sequence[Union[float, str, Tuple[int, int]]] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact type-1 quantiles of `value_col` per group: one row per
    group with ``n`` (non-null value count) and a ``p_<num>_<den>``
    column per requested quantile (``p50``/``p90``/``p99`` style names
    for two-digit percents). NULL values are excluded; groups with no
    non-null values are absent."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    rats = [_rational(q) for q in quantiles]
    names = []
    for num, den in rats:
        if 100 % den == 0:
            names.append(f"p{num * (100 // den)}")
        else:
            names.append(f"p_{num}_{den}")
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantiles: {quantiles!r}")
    _check_names([*groups, value_col], "group_percentiles input")
    clash = set(names + ["n"]) & set(groups + [value_col])
    if clash:
        raise ValueError(f"output columns collide with input columns: {sorted(clash)}")

    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*groups, value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.partitionBy(*groups).orderBy(value_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy(*groups)
    ranked = counts.withColumn("__cum", F.sum("__c").over(run)).withColumn(
        "__n", F.sum("__c").over(tot)
    )
    # target rank ceil(n*num/den) in pure LONG arithmetic; the first
    # distinct value whose cumulative count reaches it is the quantile.
    aggs = [F.max("__n").alias("n")]
    for (num, den), name in zip(rats, names):
        target = F.expr(f"(__n * {num} + {den - 1}) div {den}")
        hit: Column = F.when(F.col("__cum") >= target, F.col(value_col))
        aggs.append(F.min(hit).alias(name))
    return ranked.groupBy(*groups).agg(*aggs)


def group_histogram(
    df: DataFrame,
    group_cols: Union[str, Sequence[str]],
    value_col: str,
    bucket: int,
) -> DataFrame:
    """Fixed-width histogram of `value_col` per group: one row per
    non-empty (group, bucket) with the bucket's inclusive lower edge
    (``bucket_lo = floor(value/bucket)*bucket``, exact LONG arithmetic)
    and the row count. NULL values are excluded."""
    if bucket <= 0:
        raise ValueError("bucket must be positive")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    _check_names([*groups, value_col], "group_histogram input")
    clash = {"bucket_lo", "n"} & set(groups + [value_col])
    if clash:
        raise ValueError(f"output columns collide with input columns: {sorted(clash)}")
    c = f"cast(`{value_col}` as bigint)"
    lo = F.expr(f"{c} - pmod({c}, {int(bucket)})")
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*groups, lo.alias("bucket_lo"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
