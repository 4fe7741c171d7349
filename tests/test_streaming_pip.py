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
