"""Point-in-polygon cover join (SURVEY.md J1) — the engine's flagship op.

Replaces the reference's O(D·N) district loop (municipality_split.py:379-402
driving the ray cast at :204-243) with a cell-indexed join:

  1. polygon side: cell cover at resolution `res` (pandas UDF over the
     geometry), exploded to (cell, poly_id) pairs;
  2. point side: cell id computed as a native Catalyst expression
     (columns.cell_id_col) — never leaves the JVM;
  3. candidate generation: equi-join on cell. With `broadcast` (the default
     for subdivision-scale polygon sides) the cover is broadcast — the
     points table is NEVER shuffled, which is what makes this run at
     10^12-point scale: the big side streams map-only;
  4. exact refinement: vectorized ray-cast PIP (geom.points_in_polygon) in
     mapInPandas, with polygon geometries shipped once per executor via a
     Spark broadcast variable — geometry never rides the candidate rows.

Big-polygon-side variant (`broadcast=False`): covers are shuffled on cell
and the refinement geometry travels via an equi-join instead of a broadcast
dict; AQE skew-join plus the adaptive hot-cell explosion in
operators/partitioning.py keep cell skew bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geom as G
from ..constants import DEFAULT_CELL_RES
from ..functions.columns import cell_id_col
from ..functions.udfs import make_cover_udf, make_multipolygon_cover_udf, _polygon


def polygon_covers(
    polys: DataFrame,
    poly_id: str = "poly_id",
    geometry: str = "geometry",
    res: int = DEFAULT_CELL_RES,
    multipolygon: bool = False,
) -> DataFrame:
    """(poly_id, cell) cover pairs for the polygon side."""
    cover_udf = (
        make_multipolygon_cover_udf(res) if multipolygon else make_cover_udf(res)
    )
    return (
        polys.select(F.col(poly_id), cover_udf(F.col(geometry)).alias("cells"))
        .select(F.col(poly_id), F.explode("cells").alias("cell"))
    )


def assign_points_to_polygons(
    points: DataFrame,
    polys: DataFrame,
    *,
    poly_id: str = "poly_id",
    geometry: str = "geometry",
    lon: str = "lon",
    lat: str = "lat",
    res: int = DEFAULT_CELL_RES,
    multipolygon: bool = False,
    broadcast: bool = True,
    keep_unassigned: bool = False,
) -> DataFrame:
    """Point rows annotated with the containing polygon's id.

    Semantics match municipality_split.py:737-750: a point inside several
    polygons gets one row per containing polygon; `keep_unassigned=True`
    keeps non-contained points with NULL poly_id (the 'leftover' anti-join
    of municipality_split.py:752-762 becomes a simple filter).
    """
    spark = points.sparkSession
    covers = polygon_covers(polys, poly_id, geometry, res, multipolygon)

    pts = points.withColumn("__cell", cell_id_col(F.col(lon), F.col(lat), res))

    if broadcast:
        cand = pts.join(
            F.broadcast(covers.withColumnRenamed("cell", "__cell")), "__cell"
        )
        # ship geometries once per executor, not once per row
        geoms = {
            r[poly_id]: r[geometry]
            for r in polys.select(poly_id, geometry).collect()
        }
        bc = spark.sparkContext.broadcast(geoms)

        out_schema = T.StructType(
            [f for f in cand.schema.fields if f.name != "__cell"]
        )

        def refine(batches):
            lookup = bc.value
            cache: dict = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                keep = np.zeros(len(pdf), dtype=bool)
                pts_xy = np.stack(
                    [pdf[lon].to_numpy(np.float64), pdf[lat].to_numpy(np.float64)],
                    axis=1,
                )
                for pid, idx in pdf.groupby(poly_id, sort=False).indices.items():
                    geom_raw = lookup[pid]
                    if pid not in cache:
                        if multipolygon:
                            cache[pid] = [_polygon(p) for p in geom_raw]
                        else:
                            cache[pid] = _polygon(geom_raw)
                    g = cache[pid]
                    sub = pts_xy[idx]
                    inside = (
                        G.points_in_multipolygon(sub, g)
                        if multipolygon
                        else G.points_in_polygon(sub, g)
                    )
                    keep[idx] = inside
                yield pdf.loc[keep].drop(columns=["__cell"])

        assigned = cand.mapInPandas(refine, schema=out_schema)
    else:
        # big polygon side: geometry travels through a cell-partitioned join
        cand = pts.join(covers.withColumnRenamed("cell", "__cell"), "__cell")
        with_geom = cand.join(polys.select(poly_id, geometry), poly_id)

        out_fields = [
            f for f in with_geom.schema.fields if f.name not in ("__cell", geometry)
        ]
        out_schema = T.StructType(out_fields)

        def refine_shuffled(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                keep = np.zeros(len(pdf), dtype=bool)
                pts_xy = np.stack(
                    [pdf[lon].to_numpy(np.float64), pdf[lat].to_numpy(np.float64)],
                    axis=1,
                )
                for pid, idx in pdf.groupby(poly_id, sort=False).indices.items():
                    geom_raw = pdf[geometry].iloc[idx[0]]
                    g = (
                        [_polygon(p) for p in geom_raw]
                        if multipolygon
                        else _polygon(geom_raw)
                    )
                    inside = (
                        G.points_in_multipolygon(pts_xy[idx], g)
                        if multipolygon
                        else G.points_in_polygon(pts_xy[idx], g)
                    )
                    keep[idx] = inside
                yield pdf.loc[keep].drop(columns=["__cell", geometry])

        assigned = with_geom.mapInPandas(refine_shuffled, schema=out_schema)

    if keep_unassigned:
        assigned = assigned.persist()  # read twice: result + leftover anti-join
        point_cols = [c for c in points.columns]
        leftovers = points.join(
            assigned.select(*point_cols).distinct(), point_cols, "left_anti"
        ).withColumn(poly_id, F.lit(None).cast(assigned.schema[poly_id].dataType))
        assigned = assigned.select(*point_cols, poly_id).unionByName(
            leftovers.select(*point_cols, poly_id)
        )
    return assigned
