"""Raster-tile ↔ vector-footprint overlay (north-star operator).

Maps between the raster world (images keyed by location → cell 'tiles' at
a chosen resolution) and the vector world (building footprints): which
footprints intersect each tile, and which images fall on which footprint
through the tile index.

  footprint_tiles:  footprints → (ref, tile, full) — the polygon's cell
                    cover with the polyfill interior flag (full tiles are
                    provably inside; boundary tiles carry uncertainty),
                    Arrow-batched over the footprint table (scales with
                    the footprint side, unlike driver-side covers);
  image_tiles:      images (with derived lon/lat) → tile id, pure
                    Catalyst arithmetic;
  raster_vector_overlay: images × footprints through the shared tile key;
                    boundary-tile candidates refine with the exact native
                    ray cast — interior-tile candidates skip it.

The tile id IS the engine cell id (cells.py), so overlays compose with
k-ring/kNN/partitioning machinery for free.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import cells as C
from ..constants import DEFAULT_CELL_RES
from ..functions.columns import cell_id_col
from ..functions.udfs import _polygon
from .cover_join import flatten_geometry_col, rings_contains_col, RINGS_T


_TILES_SCHEMA = T.StructType(
    [
        T.StructField("ref", T.StringType()),
        T.StructField("tile", T.LongType()),
        T.StructField("full", T.BooleanType()),
    ]
)


def footprint_tiles(
    polys: DataFrame,
    res: int = DEFAULT_CELL_RES,
    ref_col: str = "ref",
    geometry: str = "geometry",
) -> DataFrame:
    """(ref, tile, full) cover rows, computed in executors."""

    def kernel(batches):
        for pdf in batches:
            refs, tiles, fulls = [], [], []
            for ref, g in zip(pdf[ref_col], pdf[geometry]):
                cc, full = C.cover_polygon_flags(_polygon(g), res)
                for cell, f in zip(cc.tolist(), full.tolist()):
                    refs.append(ref)
                    tiles.append(int(cell))
                    fulls.append(bool(f))
            yield pd.DataFrame({"ref": refs, "tile": tiles, "full": fulls})

    return polys.select(ref_col, geometry).mapInPandas(kernel, schema=_TILES_SCHEMA)


def image_tiles(
    images_located: DataFrame, res: int = DEFAULT_CELL_RES,
    lon: str = "lon", lat: str = "lat",
) -> DataFrame:
    """Images with derived location → + tile column (native)."""
    return images_located.withColumn(
        "tile", cell_id_col(F.col(lon), F.col(lat), res)
    )


def raster_vector_overlay(
    images_located: DataFrame,
    polys: DataFrame,
    res: int = DEFAULT_CELL_RES,
    *,
    ref_col: str = "ref",
    geometry: str = "geometry",
    lon: str = "lon",
    lat: str = "lat",
    exact: bool = True,
    broadcast: bool = True,
) -> DataFrame:
    """(image columns…, tile, ref) — images overlaid onto footprints.

    exact=True refines boundary-tile candidates with the native ray cast
    (interior-tile candidates are proven by the tile alone); exact=False
    returns the conservative tile-level overlay (superset — the cheap
    variant when downstream re-verifies anyway).

    broadcast=True (default) is the north-star raster≫vector shape: the
    footprint tile cover and the flattened rings are materialized once
    (the Python tile kernel has no Catalyst stats, so without the hint
    the planner SMJ-shuffled the full image table — a measured 4M-row
    exchange plus a second kernel evaluation at bench scale) and
    broadcast, keeping the image side MAP-ONLY: one scan, no exchange,
    boundary refine folded into the same pass as a lazy conditional.
    HARD CONTRACT: the footprint side (cover rows + rings) must fit the
    broadcast limit — pass broadcast=False for footprint tables beyond
    ~1e7 covers and let the planner shuffle both sides."""
    tiles = footprint_tiles(polys, res, ref_col, geometry)
    if broadcast:
        # one kernel evaluation, materialized blocks (ContextCleaner-
        # managed), then a broadcast build from the checkpoint
        tiles = F.broadcast(tiles.localCheckpoint(eager=True))
    imgs = image_tiles(images_located, res, lon, lat)
    cand = imgs.join(tiles, "tile")
    if not exact:
        return cand.drop("full")
    out_cols = [c for c in cand.columns if c != "full"]
    geoms = polys.select(
        F.col(ref_col),
        flatten_geometry_col(F.col(geometry), multipolygon=False).alias("__rings"),
    )
    if broadcast:
        # single pass: every candidate row sees its rings via the
        # broadcast probe, but the ray cast only evaluates on boundary
        # rows (the `full` short-circuit) — interior hits stay free
        refined = (
            cand.join(F.broadcast(geoms), ref_col)
            .filter(
                F.col("full")
                | rings_contains_col(F.col("__rings"), F.col(lon), F.col(lat))
            )
            .select(*out_cols)
        )
        return refined
    # only BOUNDARY-tile candidates need the ring payload — in a dense
    # raster the full-tile majority is proven by the tile alone, so
    # joining the flattened rings onto those rows would ship the geometry
    # through the hot candidate shuffle just to drop it in the filter
    full_hits = cand.filter(F.col("full")).drop("full")
    boundary = cand.filter(~F.col("full")).drop("full")
    with_geom = boundary.join(geoms, ref_col)
    refined = with_geom.filter(
        rings_contains_col(F.col("__rings"), F.col(lon), F.col(lat))
    ).drop("__rings")
    return full_hits.unionByName(refined)


def tile_summary(overlay: DataFrame) -> DataFrame:
    """Per-tile rollup: images and distinct footprints per tile — the
    metrics surface for tile-level skew monitoring."""
    return overlay.groupBy("tile").agg(
        F.count("*").alias("n_images"),
        F.countDistinct("ref").alias("n_footprints"),
    )
