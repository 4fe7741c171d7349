"""Cover-join PIP operator vs brute-force numpy ground truth."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from building2osm_spark import geom
from building2osm_spark.operators.cover_join import assign_points_to_polygons
from building2osm_spark.sources import fixtures as FX


def brute_force_assign(points_pdf, subs_pdf):
    """(image_id, name) pairs by direct numpy multipolygon PIP."""
    pts = points_pdf[["lon", "lat"]].to_numpy(np.float64)
    out = set()
    for _, sub in subs_pdf.iterrows():
        mp = [[np.asarray(r, dtype=np.float64) for r in poly] for poly in sub["geometry"]]
        inside = geom.points_in_multipolygon(pts, mp)
        for img_id in points_pdf.loc[inside, "image_id"]:
            out.add((img_id, sub["name"]))
    return out


@pytest.fixture(scope="module")
def data(spark):
    images = FX.spark_images(spark, 800, hot_frac=0.3, with_loc=True)
    subs = FX.spark_subdivisions(spark, 4, 4)
    return images, subs, FX.images_pdf(800, hot_frac=0.3, with_loc=True), FX.subdivisions_pdf(4, 4)


import pytest as _pytest


@_pytest.mark.parametrize(
    "broadcast,refine",
    [(True, "native"), (False, "native"), (True, "arrow"), (False, "arrow")],
)
def test_assignment_matches_brute_force(spark, data, broadcast, refine):
    images, subs, images_pdf, subs_pdf = data
    got_df = assign_points_to_polygons(
        images.select("image_id", "lon", "lat"),
        subs.select(F.col("name").alias("poly_id"), "geometry"),
        multipolygon=True,
        broadcast=broadcast,
        refine=refine,
    )
    got = {(r.image_id, r.poly_id) for r in got_df.collect()}
    want = brute_force_assign(images_pdf, subs_pdf)
    assert got == want
    assert len(got) > 0


def test_unrolled_matches_brute_force(spark, data):
    from building2osm_spark.operators.cover_join import assign_points_unrolled

    images, subs, images_pdf, subs_pdf = data
    polys_rows = [(r["name"], r["geometry"]) for _, r in subs_pdf.iterrows()]
    got_df = assign_points_unrolled(
        images.select("image_id", "lon", "lat"),
        polys_rows,
        multipolygon=True,
    )
    got = {(r.image_id, r.poly_id) for r in got_df.collect()}
    want = brute_force_assign(images_pdf, subs_pdf)
    assert got == want  # grid districts are disjoint → sets equal
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Join"):
        assert marker not in plan  # join-free, Python-free


def test_native_plan_has_no_python(spark, data):
    images, subs, *_ = data
    got_df = assign_points_to_polygons(
        images.select("image_id", "lon", "lat"),
        subs.select(F.col("name").alias("poly_id"), "geometry"),
        multipolygon=True,
        refine="native",
    )
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_hole_excludes_points(spark, data):
    images, subs, images_pdf, subs_pdf = data
    # points inside the hole of district (1,1) must be unassigned to it
    sub = subs_pdf[subs_pdf["name"] == "101 District"].iloc[0]
    hole = np.asarray(sub["geometry"][0][1], dtype=np.float64)
    pts = images_pdf[["lon", "lat"]].to_numpy(np.float64)
    in_hole = geom.points_in_ring(pts, hole)
    got_df = assign_points_to_polygons(
        images.select("image_id", "lon", "lat"),
        subs.select(F.col("name").alias("poly_id"), "geometry"),
        multipolygon=True,
    )
    assigned_101 = {
        r.image_id for r in got_df.filter(F.col("poly_id") == "101 District").collect()
    }
    hole_ids = set(images_pdf.loc[in_hole, "image_id"])
    assert assigned_101.isdisjoint(hole_ids)
    if in_hole.any():
        # hole points exist and fall in NO district of the hole's tile
        assert len(hole_ids) > 0


def test_keep_unassigned_marks_leftovers(spark):
    # half the grid only → points in the uncovered half get NULL poly_id
    images = FX.spark_images(spark, 300, with_loc=True)
    subs = FX.spark_subdivisions(spark, 4, 4)
    half = subs.filter(F.col("name") < "2")  # districts with ix in {0,1}
    got = assign_points_to_polygons(
        images.select("image_id", "lon", "lat"),
        half.select(F.col("name").alias("poly_id"), "geometry"),
        multipolygon=True,
        keep_unassigned=True,
    )
    rows = got.collect()
    n_null = sum(1 for r in rows if r.poly_id is None)
    n_assigned = sum(1 for r in rows if r.poly_id is not None)
    assert n_null > 0 and n_assigned > 0
    assert {r.image_id for r in rows} == {f"img_{i:012d}" for i in range(300)}


def test_points_side_not_shuffled_in_broadcast_plan(spark, data):
    """Scale contract: with broadcast=True the points side must reach the
    refine stage without an Exchange on the points (only the tiny cover side
    is exchanged/broadcast)."""
    images, subs, *_ = data
    got_df = assign_points_to_polygons(
        images.select("image_id", "lon", "lat"),
        subs.select(F.col("name").alias("poly_id"), "geometry"),
        multipolygon=True,
        broadcast=True,
    )
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the only allowed exchange is the broadcast one
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")
