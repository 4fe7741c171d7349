"""OSM element tables → conflation-ready buildings (SURVEY.md S7 + P6).

The reference's load_osm_buildings (building_merge.py:386-470) turns raw
Overpass elements into matchable buildings. Dataflow equivalent over the
three element tables:

  1. relation-member exclusion set (building_merge.py:402-406 → U4);
  2. eligibility filter P6 (building_merge.py:415-421): has building tag,
     no building:part, ≥3 nodes, closed ring, not a relation member;
  3. ring resolution: explode way nodes positionally, join node coords,
     regroup in order (J9 light — ways are already rings here);
  4. centre (vertex mean), merge-radius area, tagged flag (P7), ref tag —
     the exact columns operators/conflate.py consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import area_merge_udf, centre_udf
from .tags import tagged_flag


def osm_buildings_from_elements(
    nodes: DataFrame, ways: DataFrame, relations: DataFrame | None = None
) -> DataFrame:
    """(osm_id, ring, c_lon, c_lat, area, tagged, ref_tag, tags)."""
    eligible = ways.filter(
        F.map_contains_key("tags", "building")
        & ~F.map_contains_key("tags", "building:part")
        & (F.size("nodes") > 2)
        & (F.element_at("nodes", 1) == F.element_at("nodes", -1))
    )
    if relations is not None:
        members = (
            relations.select(F.explode("members").alias("m"))
            .filter(F.col("m.type") == "way")
            .select(F.col("m.ref").alias("id"))
            .distinct()
        )
        eligible = eligible.join(members, "id", "left_anti")

    has_center = "center" in eligible.columns
    base_cols = [F.col("id").alias("osm_id"), "tags"]
    if has_center:
        base_cols.append("center")
    resolved = (
        eligible.select(
            *base_cols,
            F.posexplode("nodes").alias("pos", "node_id"),
        )
        .join(
            nodes.select(F.col("id").alias("node_id"), "lon", "lat"), "node_id"
        )
        .groupBy("osm_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "lon", "lat"))),
                lambda s: F.array(s["lon"], s["lat"]),
            ).alias("ring"),
            F.first("tags").alias("tags"),
            *([F.first("center").alias("center")] if has_center else []),
        )
    )
    geom_wrapped = F.array("ring")  # centre/area UDFs take rings×pts×2
    # the reference keeps the Overpass `out center` bbox centre when the
    # response carries one (building_merge.py:429-431) and the vertex-mean
    # centre only enters via polygon_centre elsewhere — prefer the
    # element's centre, fall back to the vertex mean
    if has_center:
        c_lon = F.coalesce(F.col("center.lon"), centre_udf(geom_wrapped)["lon"])
        c_lat = F.coalesce(F.col("center.lat"), centre_udf(geom_wrapped)["lat"])
    else:
        c_lon = centre_udf(geom_wrapped)["lon"]
        c_lat = centre_udf(geom_wrapped)["lat"]
    return resolved.select(
        "osm_id",
        "ring",
        c_lon.alias("c_lon"),
        c_lat.alias("c_lat"),
        area_merge_udf(geom_wrapped).alias("area"),
        tagged_flag(F.col("tags")).alias("tagged"),
        F.col("tags")["ref:bygningsnr"].alias("ref_tag"),
        "tags",
    )
