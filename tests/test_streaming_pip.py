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
