"""Streaming + PIP composition: incremental tile assignment with resume —
the north-star 'resumable from checkpoint' flow end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from building2osm_spark.operators.cover_join import assign_points_to_polygons
from building2osm_spark.sources.checkpoint import SnapshotStore
from building2osm_spark.sources import fixtures as FX
from building2osm_spark.streaming.incremental import run_available_now


def test_streaming_incremental_assignment(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    subs = spark.createDataFrame(
        FX.subdivisions_pdf(4, 4), schema=FX.SUBDIVISIONS_SCHEMA
    ).select(F.col("name").alias("district"), "geometry")

    batch1 = spark.createDataFrame(
        FX.images_pdf(200, with_loc=True)[["image_id", "lon", "lat"]]
    )
    batch1.write.parquet(in_dir)

    def assign(batch):
        return assign_points_to_polygons(
            batch, subs, poly_id="district", multipolygon=True, broadcast=True
        )

    store = SnapshotStore(str(tmp_path / "snap"))
    run_available_now(
        spark, in_dir, "image_id string, lon double, lat double",
        store, "assign", "image_id",
        checkpoint_dir=str(tmp_path / "ckpt"), transform=assign,
    )
    first = store.read(spark, "assign")
    n1 = first.count()
    assert n1 > 150  # most of the 200 land in some district

    # new files: 100 fresh images + 50 already-committed ids → only the
    # fresh ones commit
    pdf2 = FX.images_pdf(300, with_loc=True)[["image_id", "lon", "lat"]].iloc[150:]
    spark.createDataFrame(pdf2).write.mode("append").parquet(in_dir)
    run_available_now(
        spark, in_dir, "image_id string, lon double, lat double",
        store, "assign", "image_id",
        checkpoint_dir=str(tmp_path / "ckpt"), transform=assign,
    )
    final = store.read(spark, "assign")
    assert final.select("image_id").distinct().count() == final.count()
    assert final.count() > n1
    # lineage chain recorded
    m = store.manifest("assign")
    assert len(m["inputs"]) == 1


def test_incremental_tile_counts(spark, tmp_path):
    """Resumable tile pyramid: counts equal the batch pyramid over the
    DISTINCT committed keys after overlapping re-feeds (the anti-join
    is what makes streaming counts idempotent), and a re-run with no
    new files changes nothing."""
    from building2osm_spark.operators.partitioning import tile_pyramid
    from building2osm_spark.streaming.incremental import incremental_tile_counts

    bbox, zmax = (10.60, 59.85, 11.00, 60.05), 5
    in_dir = str(tmp_path / "in")
    schema = "image_id string, lon double, lat double"
    store = SnapshotStore(str(tmp_path / "snap"))

    pdf = FX.images_pdf(300, with_loc=True)[["image_id", "lon", "lat"]]
    spark.createDataFrame(pdf.iloc[:200]).write.parquet(in_dir)

    def counts(df):
        return {(r.z, r.tx, r.ty): r.n_points for r in df.collect()}

    got1 = counts(
        incremental_tile_counts(
            spark, in_dir, schema, store, "tiles",
            checkpoint_dir=str(tmp_path / "ckpt"), bbox=bbox, zmax=zmax,
        )
    )
    want1 = counts(tile_pyramid(spark.createDataFrame(pdf.iloc[:200]), bbox, zmax))
    assert got1 == want1

    # overlapping re-feed: rows 150..300 — the 50 already-committed ids
    # must not double-count
    spark.createDataFrame(pdf.iloc[150:]).write.mode("append").parquet(in_dir)
    got2 = counts(
        incremental_tile_counts(
            spark, in_dir, schema, store, "tiles",
            checkpoint_dir=str(tmp_path / "ckpt"), bbox=bbox, zmax=zmax,
        )
    )
    want2 = counts(tile_pyramid(spark.createDataFrame(pdf), bbox, zmax))
    assert got2 == want2
    assert sum(n for (z, _, _), n in got2.items() if z == 0) == 300

    # idle re-run: nothing new, counts unchanged
    got3 = counts(
        incremental_tile_counts(
            spark, in_dir, schema, store, "tiles",
            checkpoint_dir=str(tmp_path / "ckpt"), bbox=bbox, zmax=zmax,
        )
    )
    assert got3 == got2


def test_incremental_conflate_resume(spark, tmp_path):
    """Directory-fed conflation commits each import ref's action row
    exactly once across batches/replays, and the committed matches equal
    a one-shot conflate_with_tags run over the union (the fixture's
    planted pairs are geographically isolated — the disjoint-batch
    contract holds)."""
    from pyspark.sql import functions as F

    from building2osm_spark.operators.conflate import conflate_with_tags
    from building2osm_spark.sources.checkpoint import SnapshotStore
    from building2osm_spark.streaming.incremental import incremental_conflate

    osm_pdf, import_pdf = FX.conflation_pdfs(32)
    osm = spark.createDataFrame(osm_pdf, schema=FX.OSM_CONFLATE_SCHEMA)
    in_dir = str(tmp_path / "imports")
    store = SnapshotStore(str(tmp_path / "snap"))

    batch1 = import_pdf.iloc[:20]
    spark.createDataFrame(batch1, schema=FX.IMPORT_CONFLATE_SCHEMA).write.mode(
        "append"
    ).parquet(in_dir)
    incremental_conflate(
        spark, in_dir, osm, store, checkpoint_dir=str(tmp_path / "ck")
    )
    got1 = store.read(spark, "conflate")
    n1 = got1.count()
    assert n1 == 20  # one action row per import ref

    # overlap: refs 10-31 — only the 12 new ones commit
    batch2 = import_pdf.iloc[10:]
    spark.createDataFrame(batch2, schema=FX.IMPORT_CONFLATE_SCHEMA).write.mode(
        "append"
    ).parquet(in_dir)
    incremental_conflate(
        spark, in_dir, osm, store, checkpoint_dir=str(tmp_path / "ck")
    )
    final = store.read(spark, "conflate")
    assert final.select("ref").distinct().count() == final.count()

    # committed actions equal the one-shot batch run over the union
    # (already-imported kind-6 refs are anti-joined in BOTH paths, so the
    # row count is one-shot's, not 32)
    props = spark.createDataFrame(
        import_pdf, schema=FX.IMPORT_CONFLATE_SCHEMA
    ).select(
        "ref",
        F.create_map(
            F.lit("building"), F.col("building"),
            F.lit("ref:bygningsnr"), F.col("ref"),
        ).alias("props"),
    )
    oneshot = conflate_with_tags(
        osm,
        spark.createDataFrame(import_pdf, schema=FX.IMPORT_CONFLATE_SCHEMA),
        props,
    )
    want = {(r["ref"], r["osm_id"], r["action"]) for r in oneshot.collect()}
    got = {(r["ref"], r["osm_id"], r["action"]) for r in final.collect()}
    assert got == want and len(got) > n1


def test_foreach_batch_params_invalidate_resume(spark, tmp_path):
    """A changed stage config must invalidate resume in the STREAMING path
    too (the params now flow through incremental_foreach_batch /
    run_available_now): same keys re-committed under new params form a
    fresh snapshot with no union and no stale lineage, never a mix of two
    configs; expire_keep bounds the copy-forward chain."""
    from pyspark.sql import functions as F

    from building2osm_spark.sources.checkpoint import SnapshotStore
    from building2osm_spark.streaming.incremental import incremental_foreach_batch

    store = SnapshotStore(str(tmp_path / "snapp"))
    df = spark.range(5).select(F.col("id").alias("ref"), F.lit("a").alias("v"))

    body1 = incremental_foreach_batch(store, "s", "ref", params={"m": 1},
                                      expire_keep=1)
    body1(df, 0)
    body1(df, 1)  # replay/identical batch: nothing new
    assert store.read(spark, "s").count() == 5
    assert store.manifest("s")["params"] == {"m": 1}

    body2 = incremental_foreach_batch(
        store, "s", "ref",
        transform=lambda d: d.withColumn("v", F.lit("b")),
        params={"m": 2}, expire_keep=1,
    )
    body2(df, 0)
    final = store.read(spark, "s")
    assert final.count() == 5  # fresh computation, NOT 10 (no stale union)
    assert {r["v"] for r in final.collect()} == {"b"}
    m = store.manifest("s")
    assert m["params"] == {"m": 2} and m["inputs"] == []
    # retention: only the newest snapshot dir remains
    import os as _os

    dirs = [d for d in _os.listdir(str(tmp_path / "snapp" / "s"))
            if d != "log.json" and not d.startswith(".")]
    assert len(dirs) == 1


def test_incremental_conflate_overlap_guard(spark, tmp_path):
    """VERDICT r3 #8: feeding overlapping geography in separate batches
    violates the disjoint-batch contract — the committed-cell guard must
    warn (default) or fail fast (on_overlap='error') instead of silently
    producing per-batch-local matches."""
    import warnings as _warnings

    import pytest

    from building2osm_spark.sources.checkpoint import SnapshotStore
    from building2osm_spark.streaming.incremental import incremental_conflate
    from tests.test_conflate_greedy import _cascade_fixture

    osm_pdf, import_pdf = _cascade_fixture()
    osm = spark.createDataFrame(osm_pdf, schema=FX.OSM_CONFLATE_SCHEMA)
    # batch 2 reuses batch 1's exact geography under a new ref — the
    # strongest overlap (same centre cell)
    batch1 = import_pdf.iloc[:1]
    batch2 = import_pdf.iloc[:1].assign(ref=["Z"])

    def run(tag, batch, **kw):
        in_dir = str(tmp_path / f"imp_{tag}")
        spark.createDataFrame(batch, schema=FX.IMPORT_CONFLATE_SCHEMA).write.mode(
            "append"
        ).parquet(in_dir)
        incremental_conflate(
            spark, in_dir, osm, kw.pop("store"),
            checkpoint_dir=str(tmp_path / f"ck_{tag}"), **kw,
        )

    # warn path — batch 1 must NOT emit the overlap warning (recording
    # instead of simplefilter('error'): escalating ALL warnings is flaky —
    # a GC'd py4j socket raises ResourceWarning nondeterministically)
    store = SnapshotStore(str(tmp_path / "snap_w"))
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        run("w1", batch1, store=store)
    assert not [w for w in rec if "overlaps" in str(w.message)]
    with pytest.warns(UserWarning, match="overlaps"):
        run("w2", batch2, store=store)

    # fail-fast path
    store2 = SnapshotStore(str(tmp_path / "snap_e"))
    run("e1", batch1, store=store2, on_overlap="error")
    with pytest.raises(Exception) as ei:
        run("e2", batch2, store=store2, on_overlap="error")
    assert "overlaps" in str(ei.value)


def test_overlap_guard_resets_on_params_change(spark, tmp_path):
    """A recompute at changed margins replaces the snapshot chain; cells
    recorded under the OLD params must not trip the guard on the
    legitimate recompute (the committed-cell record is params-keyed)."""
    import warnings as _warnings

    from building2osm_spark.sources.checkpoint import SnapshotStore
    from building2osm_spark.streaming.incremental import incremental_conflate
    from tests.test_conflate_greedy import _cascade_fixture

    osm_pdf, import_pdf = _cascade_fixture()
    osm = spark.createDataFrame(osm_pdf, schema=FX.OSM_CONFLATE_SCHEMA)
    batch = import_pdf.iloc[:1]
    store = SnapshotStore(str(tmp_path / "snap_p"))

    def run(tag, **kw):
        in_dir = str(tmp_path / f"imp_{tag}")
        spark.createDataFrame(batch, schema=FX.IMPORT_CONFLATE_SCHEMA).write.mode(
            "append"
        ).parquet(in_dir)
        incremental_conflate(
            spark, in_dir, osm, store,
            checkpoint_dir=str(tmp_path / f"ck_{tag}"),
            on_overlap="error", **kw,
        )

    run("p1")
    # SAME geography at changed margins, fresh checkpoint dir: a fresh
    # computation, not an overlapping batch — must not raise (it does warn
    # about the chain replacement, which is expected here)
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        run("p2", margin_hausdorff=9.0)
