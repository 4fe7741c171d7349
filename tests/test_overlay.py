"""Raster-tile ↔ vector-footprint overlay tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from building2osm_spark import cells, geom
from building2osm_spark.operators.overlay import (
    footprint_tiles,
    raster_vector_overlay,
    tile_summary,
)
from building2osm_spark.sources import fixtures as FX

RES = 18


def _fixture(spark):
    bpdf = FX.buildings_pdf(50)
    polys = spark.createDataFrame(
        bpdf[["ref", "geometry"]], schema=f"ref string, geometry {FX.GEOMETRY_POLYGON_T}"
    )
    images_pdf = FX.images_pdf(300, with_loc=True)
    # plant a third of the points on building centres
    for i in range(100):
        ring = np.asarray(bpdf.iloc[i % 50]["geometry"][0], dtype=np.float64)
        c = ring[:-1].mean(axis=0)
        images_pdf.loc[i, "lon"], images_pdf.loc[i, "lat"] = c[0], c[1]
    images = spark.createDataFrame(images_pdf[["image_id", "lon", "lat"]])
    return polys, images, bpdf, images_pdf


def test_footprint_tiles_cover_is_superset(spark):
    polys, _, bpdf, _ = _fixture(spark)
    rows = footprint_tiles(polys, RES).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.ref, set()).add(r.tile)
    # sampled interior points of each footprint land in covered tiles
    for _, b in bpdf.iterrows():
        ring = np.asarray(b["geometry"][0], dtype=np.float64)
        c = ring[:-1].mean(axis=0)
        if geom.points_in_ring(c[None, :], ring)[0]:
            tile = int(cells.cell_id(np.array([c[0]]), np.array([c[1]]), RES)[0])
            assert tile in by_ref[b["ref"]], b["ref"]


def test_overlay_exact_matches_brute_force(spark):
    polys, images, bpdf, images_pdf = _fixture(spark)
    got_rows = raster_vector_overlay(images, polys, RES).collect()
    got = {(r.image_id, r.ref) for r in got_rows}

    want = set()
    xy = images_pdf[["lon", "lat"]].to_numpy(np.float64)
    for _, b in bpdf.iterrows():
        rings = [np.asarray(r, dtype=np.float64) for r in b["geometry"]]
        inside = geom.points_in_polygon(xy, rings)
        for img_id in images_pdf.loc[inside, "image_id"]:
            want.add((img_id, b["ref"]))
    assert got == want
    assert len(got) >= 60


def test_overlay_conservative_is_superset(spark):
    polys, images, *_ = _fixture(spark)
    exact = {(r.image_id, r.ref) for r in raster_vector_overlay(images, polys, RES).collect()}
    loose = {
        (r.image_id, r.ref)
        for r in raster_vector_overlay(images, polys, RES, exact=False).collect()
    }
    assert exact <= loose


def test_tile_summary(spark):
    polys, images, *_ = _fixture(spark)
    overlay = raster_vector_overlay(images, polys, RES)
    summary = tile_summary(overlay).collect()
    assert sum(r.n_images for r in summary) == overlay.count()
    assert all(r.n_footprints >= 1 for r in summary)
