"""Snapshot diffing — dataset-versioning audit between two table
versions (the lineage/metrics counterpart of the checkpoint/resume
story: what changed between yesterday's corpus snapshot and today's?).

Row status is decided by a content digest over the compared columns, so
the diff carries (keys, digest) through the join — never the payload —
and the single full-outer shuffle join is the only exchange on either
side (AQE skew-splits a hot key). At 10^12 rows per side that is the
minimal possible data movement for an exact diff; a bucketed/sorted
layout on the key deletes the exchanges entirely for standing
snapshot pipelines (sources/bucketed.py pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"


def _digest(cols: list[str]) -> Column:
    """md5 over a per-column null bitmap + the separator-joined string
    casts of ``cols`` — non-null by construction (a NULL digest
    therefore means "row absent from this side"), and NULL-vs-value
    unambiguous even against strings that CONTAIN any marker byte (the
    bitmap, not an in-band marker, carries nullness). String casts are
    engine-specific for floats; cast/round float columns yourself
    (e.g. to cents longs) when the digest must match an external SQL
    twin."""
    mask = F.concat(
        *[F.when(F.col(c).isNull(), F.lit("n")).otherwise(F.lit("v")) for c in cols]
    )
    # length-prefixed values: a value CONTAINING the separator cannot
    # shift field boundaries into a colliding concat
    parts = [
        F.concat(
            F.length(F.coalesce(F.col(c).cast("string"), F.lit(""))).cast("string"),
            F.lit(":"),
            F.coalesce(F.col(c).cast("string"), F.lit("")),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, mask, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: str | list[str],
    *,
    compare_cols: list[str] | None = None,
    status_col: str = "status",
) -> DataFrame:
    """Exact row-level diff of two snapshots sharing a key: returns
    ``key_cols`` + ``status_col`` in {'added','removed','changed',
    'unchanged'}. ``compare_cols`` defaults to the shared non-key
    columns; keys must be non-null and unique per side (duplicate keys
    make "changed" ill-defined — dedupe first, e.g. exact_dedup).

    ONE full-outer shuffle join carrying (keys, digest) only; aggregate
    the result for per-status counts or anti-filter it for the
    changed-row worklist of an incremental pipeline.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("need at least one key column")
    for side, df in (("old", old), ("new", new)):
        missing = [k for k in keys if k not in df.columns]
        if missing:
            raise ValueError(f"{side} side is missing key columns {missing}")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    if not compare_cols:
        raise ValueError("no columns to compare")
    for side, df in (("old", old), ("new", new)):
        missing = [c for c in compare_cols if c not in df.columns]
        if missing:
            raise ValueError(f"{side} side is missing compare columns {missing}")
    if status_col in keys:
        raise ValueError(f"status column {status_col!r} collides with a key")
    for c in ("__d_old", "__d_new"):
        if c in keys or c == status_col:
            raise ValueError(f"column {c!r} is reserved by snapshot_diff")
    o = old.select(*keys, _digest(compare_cols).alias("__d_old"))
    n = new.select(*keys, _digest(compare_cols).alias("__d_new"))
    joined = o.join(n, on=keys, how="full_outer")
    status = (
        F.when(F.col("__d_old").isNull(), F.lit("added"))
        .when(F.col("__d_new").isNull(), F.lit("removed"))
        .when(F.col("__d_old") == F.col("__d_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias(status_col))
