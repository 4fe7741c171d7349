"""Head-to-head for the other two reference pipelines:

  split:   municipality_split's per-district PIP filter (re-computes every
           building centroid PER DISTRICT, municipality_split.py:397) vs
           the engine's centroid column + cover join;
  rectify: building2osm's rectify_buildings + simplify_buildings (global
           dict mutation) vs the engine's distributed passes.

Usage: python scripts/compare_split_rectify.py [n_buildings]
Match/geometry equality for both jobs is asserted in tests; this script
measures throughput only.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    from pyspark.sql import functions as F

    from building2osm_spark.session import get_spark
    from building2osm_spark.functions.udfs import centroid_udf
    from building2osm_spark.operators.cover_join import assign_points_to_polygons
    from building2osm_spark.operators.geometry_passes import rectify_and_simplify
    from building2osm_spark.sources.fixtures import (
        GEOMETRY_POLYGON_T,
        SUBDIVISIONS_SCHEMA,
        building_geometries,
        subdivisions_pdf,
    )

    print(f"generating {n} building footprints ...", file=sys.stderr)
    geoms = building_geometries(n)
    subs_pdf = subdivisions_pdf(4, 4)

    # ---------------- split ----------------
    import municipality_split as ref_split

    buildings_features = [
        {
            "geometry": {
                "type": "Polygon",
                "coordinates": [[tuple(p) for p in ring] for ring in rings],
            },
            "properties": {"ref:bygningsnr": ref},
        }
        for ref, rings in geoms
    ]
    districts = [
        {
            "type": "Feature",
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [
                    [[tuple(p) for p in ring] for ring in poly] for poly in r["geometry"]
                ],
            },
            "properties": {"name": r["name"]},
        }
        for _, r in subs_pdf.iterrows()
    ]
    t0 = time.time()
    ref_total = 0
    for d in districts:
        ref_total += sum(1 for _ in ref_split.buildings_inside_subdivision(buildings_features, d))
    ref_split_sec = time.time() - t0

    spark = get_spark(app="split-compare", cores=32)
    bdf = spark.createDataFrame(
        geoms, schema=f"ref string, geometry {GEOMETRY_POLYGON_T}"
    ).cache()
    bdf.count()
    subs = spark.createDataFrame(subs_pdf, schema=SUBDIVISIONS_SCHEMA).select(
        F.col("name").alias("district"), "geometry"
    )

    def engine_split():
        pts = bdf.select(
            "ref",
            centroid_udf(F.col("geometry"))["lon"].alias("lon"),
            centroid_udf(F.col("geometry"))["lat"].alias("lat"),
        )
        return assign_points_to_polygons(
            pts, subs, poly_id="district", multipolygon=True, broadcast=True
        ).count()

    engine_split()  # warm-up
    t0 = time.time()
    eng_total = engine_split()
    eng_split_sec = time.time() - t0
    assert eng_total == ref_total, (eng_total, ref_total)

    print(
        f"\nsplit  reference: {n} buildings × 16 districts in {ref_split_sec:.2f}s "
        f"({n / ref_split_sec:.0f} bld/s, 1 core)"
    )
    print(
        f"split  engine:    same in {eng_split_sec:.2f}s "
        f"({n / eng_split_sec:.0f} bld/s, local[32]) — {ref_split_sec / eng_split_sec:.1f}x, "
        f"assignments equal ({eng_total})"
    )

    # ---------------- rectify + simplify ----------------
    import building2osm as ref_b2o

    buildings_dict = {
        ref: {
            "geometry": {
                "type": "Polygon",
                "coordinates": [[tuple(p) for p in ring] for ring in rings],
            },
            "properties": {},
        }
        for ref, rings in geoms
    }
    ref_b2o.buildings = buildings_dict
    ref_b2o.remove_nodes = set()
    ref_b2o.debug = False
    ref_b2o.verify = False
    t0 = time.time()
    ref_b2o.rectify_buildings()
    ref_b2o.simplify_buildings()
    ref_rect_sec = time.time() - t0

    rectify_and_simplify(bdf).count()  # warm-up
    t0 = time.time()
    rectify_and_simplify(bdf).count()
    eng_rect_sec = time.time() - t0

    print(
        f"\nrectify+simplify reference: {n} buildings in {ref_rect_sec:.2f}s "
        f"({n / ref_rect_sec:.0f} bld/s, 1 core)"
    )
    print(
        f"rectify+simplify engine:    {n} buildings in {eng_rect_sec:.2f}s "
        f"({n / eng_rect_sec:.0f} bld/s, local[32]) — {ref_rect_sec / eng_rect_sec:.1f}x"
    )


if __name__ == "__main__":
    main()
