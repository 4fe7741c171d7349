"""Dimension sources, tag merge, OSM XML sink, streaming increments."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from building2osm_spark.operators.tags import drop_debug_tags, merged_tags, tagged_flag
from building2osm_spark.sources.dims import (
    building_types,
    enrich_building_tags,
    municipalities,
    resolve_municipality,
)
from building2osm_spark.sources.osm_xml import write_osm_xml


def test_building_types_parse(spark):
    bt = building_types(spark)
    assert bt.count() == 129  # full public CSV committed under data/
    rows = {r["type_id"]: r for r in bt.collect()}
    assert rows["111"]["tags"] == {"building": "house"}
    assert rows["612"]["tags"] == {"building": "kindergarten"}
    assert rows["999"]["tags"] == {"building": "yes"}
    # multi-tag "k=v + k=v" grammar (building2osm.py:338-343) + the
    # empty-tag default — not exercised by the current CSV, so pin them
    # with an explicit rows override
    extra = building_types(
        spark,
        rows=[
            ("612x", "Museum", "building=museum + tourism=museum"),
            ("998", "Tom", ""),
        ],
    )
    er = {r["type_id"]: r for r in extra.collect()}
    assert er["612x"]["tags"] == {"building": "museum", "tourism": "museum"}
    assert er["998"]["tags"] == {"building": "yes"}


def test_building_types_parity_full_table(spark):
    """Every row's tag map matches the reference parse loop
    (building2osm.py:336-347) applied to the same committed CSV."""
    from building2osm_spark.sources.dims import BUILDING_TYPES_ROWS

    expected = {}
    for type_id, name, osm_tag in BUILDING_TYPES_ROWS:
        tags = {"building": "yes"}
        if osm_tag:
            for part in osm_tag.replace(" ", "").split("+"):
                k, v = part.split("=")
                tags[k] = v
        expected[type_id] = (name, tags)
    got = {
        r["type_id"]: (r["name"], dict(r["tags"]))
        for r in building_types(spark).collect()
    }
    assert got == expected


def test_enrich_join_broadcast(spark):
    from building2osm_spark.sources import fixtures as FX

    b = FX.spark_buildings(spark, 40)
    out = enrich_building_tags(b, building_types(spark))
    assert out.count() == 40
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    known = out.filter(F.col("tags").isNotNull())
    assert known.count() > 0


def test_compose_output_tags(spark):
    """TYPE/STATUS/DATE/heritage/SEFRAK emission — building2osm.py:637-665."""
    from building2osm_spark.sources.dims import compose_output_tags

    b = spark.createDataFrame(
        [
            ("r1", "111", "FA", "2020-05-06T12:00:00", True, "1234-0001-2"),
            ("r2", "XYZ", "RA", None, False, None),  # unknown type code
        ],
        schema="ref string, building_type string, status string, "
               "date string, heritage boolean, sefrak string",
    )
    out = compose_output_tags(enrich_building_tags(b, building_types(spark)))
    rows = {r["ref"]: r["tags"] for r in out.collect()}
    t1 = rows["r1"]
    assert t1["TYPE"] == "#111 Enebolig"
    assert t1["STATUS"] == "#FA Ferdigattest"
    assert t1["DATE"] == "2020-05-06"
    assert t1["heritage"] == "yes"
    assert t1["SEFRAK"] == "1234-0001-2"
    assert t1["building"] == "house"
    t2 = rows["r2"]
    assert t2["TYPE"] == "#XYZ"  # unknown code: bare '#<code>'
    assert t2["STATUS"] == "#RA Rammetillatelse"
    assert "DATE" not in t2 and "heritage" not in t2 and "SEFRAK" not in t2


def test_resolve_municipality_parity(spark):
    munis = municipalities(spark)
    ref = __import__("tests.conftest", fromlist=["import_reference"]).import_reference(
        "building2osm"
    )
    ref.municipalities = {m: n for m, n in
                          [(r["mun_id"], r["name"]) for r in munis.collect()]}
    for q in ["0301", "Oslo", "oslo", "berg", "Trond", "stav", "nowhere", "o"]:
        assert resolve_municipality(munis, q) == ref.get_municipality(q), q


def test_merged_tags_semantics(spark):
    df = spark.createDataFrame(
        [
            # same category (residential): no conflict flag
            ({"building": "house", "source": "x", "name": "A"},
             {"building": "detached", "ref:bygningsnr": "1"}),
            # conflicting categories: OSM_BUILDING flag
            ({"building": "industrial"}, {"building": "house", "ref:bygningsnr": "2"}),
            # osm building=yes: never a conflict
            ({"building": "yes", "building:type": "z"},
             {"building": "house", "ref:bygningsnr": "3"}),
        ],
        schema="osm_tags map<string,string>, props map<string,string>",
    )
    out = df.select(
        merged_tags(F.col("osm_tags"), F.col("props")).alias("t")
    ).collect()
    t0, t1, t2 = (r["t"] for r in out)
    assert t0["building"] == "detached" and "OSM_BUILDING" not in t0
    assert t0["name"] == "A" and "source" not in t0  # dropped key
    assert t1["OSM_BUILDING"] == "industrial" and t1["building"] == "house"
    assert "OSM_BUILDING" not in t2 and "building:type" not in t2


def test_tagged_flag_and_debug_drop(spark):
    df = spark.createDataFrame(
        [
            ({"building": "yes", "source": "s", "addr:street": "x"},),
            ({"building": "yes", "name": "T"},),
            ({"building": "yes", "DEBUG_X": "1", "VERIFY_Y": "2"},),
            ({"building": "yes", "TYPE": "v1", "STATUS": "ib",
              "DATE": "2020-01-02", "SEFRAK": "x"},),
        ],
        schema="tags map<string,string>",
    )
    rows = df.select(
        tagged_flag(F.col("tags")).alias("tagged"),
        drop_debug_tags(F.col("tags")).alias("clean"),
    ).collect()
    assert [r["tagged"] for r in rows] == [False, True, True, True]
    assert "DEBUG_X" not in rows[2]["clean"]
    # TYPE/STATUS/DATE are deliberate output properties, exempted from the
    # uppercase drop (building2osm.py:1309); other uppercase keys still go
    clean3 = rows[3]["clean"]
    assert clean3["TYPE"] == "v1" and clean3["STATUS"] == "ib"
    assert clean3["DATE"] == "2020-01-02"
    assert "SEFRAK" not in clean3


def test_osm_xml_sink(spark, tmp_path):
    nodes = spark.createDataFrame(
        [(-1001, 59.9, 10.7, {"entrance": "yes"}, None),
         (-1002, 59.91, 10.71, {}, "delete")],
        schema="id long, lat double, lon double, tags map<string,string>, action string",
    )
    ways = spark.createDataFrame(
        [(-2001, [-1001, -1002, -1001], {"building": "house"}, "modify")],
        schema="id long, nodes array<bigint>, tags map<string,string>, action string",
    )
    path = str(tmp_path / "out.osm")
    n = write_osm_xml(path, nodes, ways)
    assert n == 3
    root = ET.parse(path).getroot()
    assert root.tag == "osm" and root.get("version") == "0.6"
    kinds = [c.tag for c in root]
    assert kinds == ["node", "node", "way"]
    way = root[2]
    assert way.get("action") == "modify"
    assert [nd.get("ref") for nd in way.findall("nd")] == ["-1001", "-1002", "-1001"]
    assert way.find("tag").get("k") == "building"


def test_streaming_available_now(spark, tmp_path):
    from building2osm_spark.sources.checkpoint import SnapshotStore
    from building2osm_spark.streaming.incremental import run_available_now

    in_dir = str(tmp_path / "in")
    spark.range(100).select(
        F.col("id").alias("ref"), (F.col("id") * 3).alias("v")
    ).write.parquet(in_dir)

    store = SnapshotStore(str(tmp_path / "snap"))
    run_available_now(
        spark, in_dir, "ref long, v long", store, "stream_stage", "ref",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert store.read(spark, "stream_stage").count() == 100

    # new files arrive; same checkpoint → only the new batch processes,
    # and overlapping keys are anti-joined
    spark.range(50, 150).select(
        F.col("id").alias("ref"), (F.col("id") * 3).alias("v")
    ).write.mode("append").parquet(in_dir)
    run_available_now(
        spark, in_dir, "ref long, v long", store, "stream_stage", "ref",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    final = store.read(spark, "stream_stage")
    assert final.count() == 150
    assert final.select("ref").distinct().count() == 150


def test_assignment_pipeline(spark, tmp_path):
    from building2osm_spark.plans.pipeline import assignment_pipeline
    from building2osm_spark.sources.checkpoint import SnapshotStore
    from building2osm_spark.sources import fixtures as FX
    from building2osm_spark import geom as G
    import numpy as np

    images = FX.spark_images(spark, 200)
    subs = spark.createDataFrame(
        FX.subdivisions_pdf(2, 2).iloc[1:],  # drop one district → leftovers
        schema=FX.SUBDIVISIONS_SCHEMA,
    )
    bpdf = FX.buildings_pdf(30)
    cents = []
    for _, r in bpdf.iterrows():
        c = G.polygon_centre(np.asarray(r["geometry"][0]))
        cents.append((r["ref"], c[0], c[1]))
    buildings = spark.createDataFrame(cents, schema="ref string, c_lon double, c_lat double")

    store = SnapshotStore(str(tmp_path / "snap"))
    out = assignment_pipeline(images, subs, buildings, store=store)
    m = out["metrics"]
    assert m["n_images"] == 200
    assert m["n_assigned"] + m["n_fallback"] == 200
    assert m["n_fallback"] > 0
    assert m["n_new_committed"] == m["n_assigned"]
    # resumable: a second run commits nothing new
    out2 = assignment_pipeline(images, subs, buildings, store=store)
    assert out2["metrics"]["n_new_committed"] == 0
