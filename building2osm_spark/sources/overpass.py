"""Overpass JSON response scan (SURVEY.md S7 live shape).

The reference POSTs an Overpass query and consumes `data['elements']`
(building_merge.py:386-470). Here the saved response files (one JSON per
municipality query) load through Spark's native multiLine JSON reader
with an EXPLICIT schema (tags as map<string,string>, not an inferred
mega-struct), explode into one elements table, and split into the
(nodes, ways, relations) tables operators/osm_load.py consumes — zero
Python in the scan, predicate pushdown and column pruning apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ELEMENTS_SCHEMA = (
    "elements array<struct<"
    "type:string,id:long,lat:double,lon:double,"
    "nodes:array<long>,"
    "members:array<struct<type:string,ref:long,role:string>>,"
    "tags:map<string,string>,"
    "center:struct<lat:double,lon:double>"
    ">>"
)


def read_overpass_json(spark: SparkSession, path_glob: str) -> DataFrame:
    """Overpass response file(s) → one row per element
    (type, id, lat, lon, nodes, members, tags, center).

    FAILFAST: with an explicit schema the default PERMISSIVE mode turns a
    truncated/corrupt response file into one all-null row that the explode
    silently drops — a whole municipality's buildings would vanish with
    zero errors. A malformed file must fail the read instead."""
    raw = (
        spark.read.schema(ELEMENTS_SCHEMA)
        .option("multiLine", "true")
        .option("mode", "FAILFAST")
        .json(path_glob)
    )
    return raw.select(F.explode("elements").alias("e")).select("e.*")


def split_elements(elements: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(nodes, ways, relations) in the shapes osm_load expects."""
    nodes = elements.filter(F.col("type") == "node").select("id", "lon", "lat", "tags")
    # keep the Overpass-computed `center` (bbox centre from `out center`):
    # the reference uses it as the building centre when present
    # (building_merge.py:429-431)
    ways = elements.filter(F.col("type") == "way").select("id", "nodes", "tags", "center")
    relations = elements.filter(F.col("type") == "relation").select(
        "id", "members", "tags"
    )
    return nodes, ways, relations


def osm_buildings_from_overpass(spark: SparkSession, path_glob: str) -> DataFrame:
    """Full S7 live path: response file(s) → conflation-ready buildings
    (osm_id, ring, c_lon, c_lat, area, tagged, ref_tag, tags)."""
    from ..operators.osm_load import osm_buildings_from_elements

    nodes, ways, relations = split_elements(read_overpass_json(spark, path_glob))
    return osm_buildings_from_elements(nodes, ways, relations)
