"""Incremental / resumable runs (SURVEY.md §2.10).

The reference is strictly batch; its one streaming-adjacent contract is
idempotent re-runs — merging only buildings whose ref:bygningsnr is new
(README.md:85, building_merge.py:659-674). Two engine surfaces implement
it:

  * batch increments over SnapshotStore (sources/checkpoint.py) — the
    default, mirrored from the reference's semantics;
  * Structured Streaming with Trigger.AvailableNow + foreachBatch below —
    the optional extension for directory-fed pipelines: each micro-batch
    runs the SAME anti-join + commit path, so batch and streaming share
    one code path and one idempotence contract. No event-time windows or
    watermarks are invented — the reference has none (SURVEY.md §2.10).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.checkpoint import SnapshotStore


def incremental_foreach_batch(
    store: SnapshotStore,
    stage: str,
    key_col: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    params: dict | None = None,
    expire_keep: int | None = None,
    pre_commit: Callable[[DataFrame], None] | None = None,
    post_commit: Callable[[DataFrame], None] | None = None,
    hash_derived: bool = False,
):
    """foreachBatch body: anti-join committed keys ONCE, apply the stage
    transform to NEW rows only, commit the union as the next snapshot
    (commit_increment — the commit does not re-run the anti-join the
    batch already paid). Idempotence under foreachBatch replay holds
    because the resume filter re-runs first on replay and drops the
    already-committed keys. expire_keep bounds copy-forward storage by
    expiring all but the newest N snapshots after each commit.

    pre_commit/post_commit: optional hooks receiving the resume-filtered
    NEW rows before the transform and after a successful commit — the
    seam for batch-contract guards (e.g. incremental_conflate's
    geography-overlap check) that must observe each batch without
    entangling with the commit path."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Filter committed keys FIRST, then transform: the stage transform
        # only ever touches new rows (the reference's resume never
        # recomputes committed buildings, building_merge.py:659-674).
        new_rows, resumed = store._resume(
            batch_df.sparkSession, batch_df, stage, key_col, params=params,
            hash_derived=hash_derived,
        )
        if not resumed and store.latest(stage) is not None:
            # The fresh commit REPLACES the snapshot chain, but a streaming
            # source never re-feeds files its checkpoint already consumed:
            # unless this run uses a NEW checkpointLocation, the replacement
            # snapshot holds only the files fed after the config change —
            # sound history would silently vanish. Loud, not fatal: with a
            # fresh checkpoint dir this is exactly the intended recompute.
            import warnings

            warnings.warn(
                f"incremental[{stage}]: stage config changed — the previous "
                "snapshot chain is being replaced. If this stream reuses an "
                "old checkpointLocation, already-consumed input files will "
                "NOT be re-fed and the new chain starts from this batch "
                "only; use a fresh checkpoint_dir for a full recompute.",
                stacklevel=2,
            )
        if pre_commit is not None:
            pre_commit(new_rows)
        out = transform(new_rows) if transform is not None else new_rows
        store.commit_increment(out, stage, key_col, params=params, resumed=resumed)
        if expire_keep is not None:
            store.expire_snapshots(stage, keep_last=expire_keep)
        if post_commit is not None:
            post_commit(new_rows)

    return body


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    store: SnapshotStore,
    stage: str,
    key_col: str,
    *,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    fmt: str = "parquet",
    params: dict | None = None,
    expire_keep: int | None = None,
    pre_commit: Callable[[DataFrame], None] | None = None,
    post_commit: Callable[[DataFrame], None] | None = None,
    hash_derived: bool = False,
) -> None:
    """Drain all currently-available files from input_dir through the
    incremental path and stop (Trigger.AvailableNow): the streaming
    spelling of a resumable batch increment. Spark's checkpoint tracks
    consumed files; the SnapshotStore tracks committed keys — a crashed
    run resumes at both levels without double-commits (keys are
    anti-joined again on replay)."""
    stream = (
        spark.readStream.format(fmt).schema(schema).load(input_dir)
    )
    query = (
        stream.writeStream.foreachBatch(
            incremental_foreach_batch(
                store, stage, key_col, transform,
                params=params, expire_keep=expire_keep,
                pre_commit=pre_commit, post_commit=post_commit,
                hash_derived=hash_derived,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def _geography_overlap_guard(store: SnapshotStore, stage: str, on_overlap: str,
                             params: dict | None = None):
    """(pre_commit, post_commit) hooks enforcing incremental_conflate's
    disjoint-geography batch contract: each batch's import centres are
    hashed to CONFLATE_RES (~150 m) cells; a batch that reuses a cell a
    previous batch committed is overlapping geography — per-batch-local
    mutual-best can then silently diverge from global conflation, so the
    guard warns (default) or fails fast instead of staying silent
    (VERDICT r3 #8).

    Committed cells live in <root>/<stage>/committed_cells.json, written
    atomically AFTER the data commit: a crash between commit and record
    means the replay sees zero new keys → empty cell set → no record
    (that batch's cells go unguarded — the advisory-guard tradeoff,
    chosen over spuriously firing on every replay). Borders are fuzzy at
    cell width: two truly disjoint municipalities sharing a 150 m border
    cell trip the guard — hence warn, not raise, by default.

    The record is keyed by the stage's params hash: when the params change
    (resume invalidated, the snapshot chain replaced by a fresh
    computation), cells recorded under the old params must not trip the
    guard on the legitimate recompute — they belong to a chain that no
    longer exists."""
    import json
    import os
    import warnings

    from pyspark.sql import functions as F

    from ..functions.columns import cell_id_col
    from ..operators.conflate import CONFLATE_RES
    from ..sources.checkpoint import _params_hash, _write_json_atomic

    path = os.path.join(store.root, stage, "committed_cells.json")
    phash = _params_hash(params or {})
    pending: dict[str, set] = {"cells": set()}

    def _committed() -> set:
        if os.path.exists(path):
            with open(path) as f:
                rec = json.load(f)
            if isinstance(rec, dict):
                return set(rec["cells"]) if rec.get("params_hash") == phash else set()
            return set(rec)  # pre-params-keyed record (advisory: keep it)
        return set()

    def pre_commit(new_rows: DataFrame) -> None:
        cells = {
            r["c"]
            for r in new_rows.select(
                cell_id_col(F.col("c_lon"), F.col("c_lat"), CONFLATE_RES).alias("c")
            )
            .distinct()
            .collect()
        }
        pending["cells"] = cells
        if not cells:
            return
        overlap = cells & _committed()
        if overlap:
            msg = (
                f"incremental_conflate[{stage}]: batch geography overlaps "
                f"{len(overlap)} previously committed ~150 m cells — "
                "mutual-best is per-batch-local, so matches across this "
                "overlap may diverge from a one-shot conflation. Feed "
                "geographically disjoint batches (one municipality per "
                "file), or conflate the union in one batch."
            )
            if on_overlap == "error":
                raise ValueError(msg)
            warnings.warn(msg, stacklevel=2)

    def post_commit(new_rows: DataFrame) -> None:
        if not pending["cells"]:
            return
        os.makedirs(os.path.dirname(path), exist_ok=True)
        _write_json_atomic(
            path,
            {"params_hash": phash,
             "cells": sorted(_committed() | pending["cells"])},
        )

    return pre_commit, post_commit


def incremental_conflate(
    spark: SparkSession,
    imports_dir: str,
    osm: DataFrame,
    store: SnapshotStore,
    *,
    checkpoint_dir: str,
    stage: str = "conflate",
    expire_keep: int | None = None,
    on_overlap: str = "warn",
    **conflate_kwargs,
) -> None:
    """Resume-safe conflation over a directory feed of import batches:
    each micro-batch anti-joins the already-committed refs, runs the full
    G3 merge (conflate_with_tags: mutual-best match + add_building tag
    merge + action rows) on the NEW import buildings against the static
    OSM table, and commits the action rows keyed by ref. A crashed or
    re-triggered run resumes without recomputing or double-committing any
    ref — the streaming spelling of the reference's idempotent
    per-municipality re-run (building_merge.py:659-674).

    Scope contract: mutual-best is evaluated between each batch's new
    imports and the full OSM table. That equals global conflation when
    batches are geographically disjoint (the reference's workflow —
    one municipality per file); feeding overlapping geographies in
    separate batches can split a mutual-best decision across batches.
    The contract is now ENFORCED by a cheap committed-cell check
    (_geography_overlap_guard): on_overlap='warn' (default) warns,
    'error' fails the batch fast, 'ignore' disables the check AND its
    per-batch cell-collect job + record entirely (the guard does not
    affect the computation, so it is deliberately outside the
    resume-invalidating params hash). The committed-cell record is keyed
    by the stage's effective params hash, so a legitimate recompute at
    changed margins does not trip the guard against the replaced chain's
    geography.

    Expects import files with the IMPORT_CONFLATE_SCHEMA shape
    (ref, ring, c_lon, c_lat, area, building); minimal OSM props are
    synthesized as the CLI merge does for parquet imports.
    """
    from pyspark.sql import functions as F

    from ..constants import MARGIN_AREA, MARGIN_HAUSDORFF, MARGIN_TAGGED
    from ..operators.conflate import conflate_with_tags
    from ..sources.fixtures import IMPORT_CONFLATE_SCHEMA

    # the EFFECTIVE config, defaults included: "same defaults, spelled
    # explicitly" must hash equal to "no kwargs", and any changed margin
    # must invalidate resume
    effective = {
        "margin_hausdorff": MARGIN_HAUSDORFF,
        "margin_tagged": MARGIN_TAGGED,
        "margin_area": MARGIN_AREA,
        "remove_addr": False,
        "debug": False,
    }
    effective.update(conflate_kwargs)

    def transform(new_imports: DataFrame) -> DataFrame:
        props = new_imports.select(
            "ref",
            F.create_map(
                F.lit("building"), F.col("building"),
                F.lit("ref:bygningsnr"), F.col("ref"),
            ).alias("props"),
        )
        return conflate_with_tags(osm, new_imports, props, **conflate_kwargs)

    # 'ignore' disables the guard entirely — no per-batch cell collect job
    # and no committed_cells record (re-enabling the guard later starts
    # from an empty advisory record, which is its documented best-effort)
    pre_commit, post_commit = (
        (None, None)
        if on_overlap == "ignore"
        else _geography_overlap_guard(store, stage, on_overlap, params=effective)
    )
    run_available_now(
        spark,
        imports_dir,
        IMPORT_CONFLATE_SCHEMA,
        store,
        stage,
        "ref",
        checkpoint_dir=checkpoint_dir,
        transform=transform,
        # the margins ARE the computation's identity: a re-run with
        # different thresholds must invalidate resume, not silently mix
        # action rows from two configs in one snapshot chain
        params=effective,
        expire_keep=expire_keep,
        pre_commit=pre_commit,
        post_commit=post_commit,
    )


def incremental_tile_counts(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    store: SnapshotStore,
    stage: str,
    *,
    checkpoint_dir: str,
    bbox: tuple[float, float, float, float],
    zmax: int,
    key_col: str = "image_id",
    lon: str = "lon",
    lat: str = "lat",
    fmt: str = "parquet",
    expire_keep: int | None = None,
) -> DataFrame:
    """Resumable multi-zoom tile counts over a directory-fed point/image
    stream: drain all available files (Trigger.AvailableNow), commit
    only rows whose key is NEW (the SnapshotStore anti-join — replayed
    or overlapping input files cannot double-count, the property a
    plain streaming count aggregation does not give you across
    re-feeds), then roll the committed snapshot up with tile_pyramid.

    The commit stores raw (key, lon, lat), so ``bbox``/``zmax`` can
    change between reads without invalidating the snapshot chain; the
    rollup inherits tile_pyramid's one-corpus-shuffle shape, and the
    snapshot manifests carry the per-partition lineage + row-count
    metrics. Returns the (z, tx, ty, n_points) pyramid over everything
    committed so far (empty with the standard schema before the first
    commit)."""
    from ..operators.partitioning import tile_pyramid

    run_available_now(
        spark, input_dir, schema, store, stage, key_col,
        checkpoint_dir=checkpoint_dir, fmt=fmt, expire_keep=expire_keep,
        transform=lambda df: df.select(key_col, lon, lat),
    )
    committed = store.read(spark, stage)
    if committed is None:
        return spark.createDataFrame(
            [], "z int, tx bigint, ty bigint, n_points bigint"
        )
    return tile_pyramid(committed, bbox, zmax, lon=lon, lat=lat)
