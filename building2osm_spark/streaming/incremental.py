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
):
    """foreachBatch body: anti-join committed keys ONCE, apply the stage
    transform to NEW rows only, commit the union as the next snapshot
    (commit_increment — the commit does not re-run the anti-join the
    batch already paid). Idempotence under foreachBatch replay holds
    because the resume filter re-runs first on replay and drops the
    already-committed keys. expire_keep bounds copy-forward storage by
    expiring all but the newest N snapshots after each commit."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Filter committed keys FIRST, then transform: the stage transform
        # only ever touches new rows (the reference's resume never
        # recomputes committed buildings, building_merge.py:659-674).
        new_rows, resumed = store._resume(
            batch_df.sparkSession, batch_df, stage, key_col, params=params
        )
        out = transform(new_rows) if transform is not None else new_rows
        store.commit_increment(out, stage, key_col, params=params, resumed=resumed)
        if expire_keep is not None:
            store.expire_snapshots(stage, keep_last=expire_keep)

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
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def incremental_conflate(
    spark: SparkSession,
    imports_dir: str,
    osm: DataFrame,
    store: SnapshotStore,
    *,
    checkpoint_dir: str,
    stage: str = "conflate",
    expire_keep: int | None = None,
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
    )
