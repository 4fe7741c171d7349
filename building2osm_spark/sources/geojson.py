"""Canonical GeoJSON sink + source (SURVEY.md S6/S9).

The reference writes one FeatureCollection per municipality with
indent=2, ensure_ascii=False, temp keys dropped and UPPERCASE debug tags
filtered unless flagged (building2osm.py:1276-1334). The engine's sink is
a deterministic single-file writer over a collected DataFrame, ordered by
ref (SURVEY.md O4) — output is inherently one document, so the collect is
by design; Parquet/snapshots are the engine-internal format.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_geojson(
    df: DataFrame,
    path: str,
    *,
    ref_col: str = "ref",
    geometry_col: str = "geometry",
    tags_col: str | None = "tags",
    geom_type: str = "Polygon",
    geom_type_col: str | None = None,
    keep_uppercase: bool = False,
    keep_verify: bool = False,
    keep_sefrak: bool = False,
    max_rows: int = 5_000_000,
) -> int:
    """Write a canonical FeatureCollection; returns the feature count.

    Ordering: ascending ref with a deterministic tiebreak on the
    serialized geometry (Spark's sort is not stable for duplicate/NULL
    refs across partition layouts — the byte-compare contract needs a
    total order). Coordinates are emitted as-is (rounding to 7 decimals
    happens upstream at the geometry boundary, matching
    building2osm.py:621,1226). UPPERCASE tag keys (debug/verify) are
    dropped unless keep_uppercase — building2osm.py:1306-1311;
    keep_sefrak reproduces the reference's -original mode (SEFRAK
    survives the uppercase drop). geom_type_col names a per-row geometry
    type column (mixed Polygon/MultiPolygon tables); geom_type is the
    constant fallback. max_rows caps the driver-side collect (the output
    is one JSON document, so the sink is inherently single-process).
    """
    cols = [ref_col, geometry_col] + ([tags_col] if tags_col else [])
    if geom_type_col:
        cols.append(geom_type_col)
    # single-document sink ⇒ driver-side collect by design, but guard it:
    # a table beyond max_rows would OOM the driver silently — bound the
    # collect (CollectLimit short-circuits) and fail with an actionable
    # message instead. No extra job: the +1 row is the overflow sentinel.
    rows = df.select(*cols).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_geojson collects to the driver for the single-file "
            f"FeatureCollection: input exceeds max_rows={max_rows}. "
            f"Split the table (e.g. per municipality, as the reference "
            f"does), write parquet instead, or pass a larger max_rows= "
            f"if the driver really has the memory."
        )
    # nulls FIRST (matching Spark orderBy's default), then ref ascending
    # with a serialized-geometry tiebreak. The null placeholder only
    # compares within the null group (the leading flag separates groups),
    # so numeric ref columns — including falsy ref 0 — never mix types.
    rows.sort(
        key=lambda r: (
            r[ref_col] is not None,
            "" if r[ref_col] is None else r[ref_col],
            json.dumps(r[geometry_col]),
        )
    )
    features = []
    for r in rows:
        props = {}
        if tags_col:
            for k, v in (r[tags_col] or {}).items():
                # k == k.upper() (not isupper(): letterless keys count as
                # uppercase in the reference) with the TYPE/STATUS/DATE
                # exemption and the verify-flag VERIFY_* exemption of
                # building2osm.py:1309.
                if (
                    keep_uppercase
                    or k != k.upper()
                    or k in ("TYPE", "STATUS", "DATE")
                    or (keep_verify and "VERIFY" in k)
                    or (keep_sefrak and k == "SEFRAK")
                ):
                    props[k] = v
        props.setdefault("ref:bygningsnr", r[ref_col])
        features.append(
            {
                "type": "Feature",
                "geometry": {
                    "type": r[geom_type_col] if geom_type_col else geom_type,
                    "coordinates": r[geometry_col],
                },
                "properties": props,
            }
        )
    collection = {"type": "FeatureCollection", "features": features}
    with open(path, "w", encoding="utf-8") as f:
        json.dump(collection, f, indent=2, ensure_ascii=False)
    return len(features)


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """FeatureCollection → DataFrame(ref, geometry, geom_type, tags) —
    the S6 import-file scan (building_merge.py:322-380 input shape).

    The geometry column is Polygon-shaped (rings × points × 2). Real
    reference output files also contain Point features (buildings without
    footprints, building2osm.py keeps any non-empty coordinates) and may
    contain MultiPolygons: Points are wrapped as a 1-vertex ring and
    MultiPolygons flattened to their rings, with geom_type preserving the
    original type so consumers can filter (the P1 geometry-type filter) —
    a hardcoded Polygon depth would crash the whole read on the first
    Point feature."""
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    rows = []
    for feat in data["features"]:
        props = feat.get("properties", {}) or {}
        gtype = feat["geometry"]["type"]
        coords = feat["geometry"]["coordinates"]
        if gtype == "Point":
            coords = [[coords]]
        elif gtype == "MultiPolygon":
            coords = [ring for poly in coords for ring in poly]
        rows.append(
            (
                props.get("ref:bygningsnr"),
                coords,
                gtype,
                {str(k): str(v) for k, v in props.items()},
            )
        )
    return spark.createDataFrame(
        rows,
        schema=(
            "ref string, geometry array<array<array<double>>>, "
            "geom_type string, tags map<string,string>"
        ),
    )
