"""Ring/polygon assembly parity with the reference's unit fixtures
(tests/test_municipality_split.py:3-61)."""

from __future__ import annotations

from building2osm_spark.operators.assembly import (
    assemble_polygon,
    assemble_relations,
    stitch_rings,
)
from tests.conftest import import_reference

RELATION_WAYS = [
    {"id": 500, "nodes": [1, 2, 3]},
    {"id": 502, "nodes": [5, 6, 7]},
    {"id": 501, "nodes": [5, 4, 3]},
    {"id": 505, "nodes": [1, 9, 7]},
]
NODES = {
    1: {"lat": 59.8111, "lon": 10.7183},
    2: {"lat": 59.8340, "lon": 10.8364},
    3: {"lat": 59.8791, "lon": 10.9067},
    4: {"lat": 59.9394, "lon": 10.8977},
    5: {"lat": 59.9769, "lon": 10.8439},
    6: {"lat": 59.9929, "lon": 10.7317},
    7: {"lat": 59.9754, "lon": 10.5994},
    9: {"lat": 59.8596, "lon": 10.5956},
}
MEMBERS = [
    {"type": "way", "ref": 500, "role": "outer"},
    {"type": "way", "ref": 501, "role": "outer"},
    {"type": "way", "ref": 502, "role": "outer"},
    {"type": "way", "ref": 505, "role": "outer"},
]


def test_stitch_rings_reference_case():
    # expected ring from the reference's own unit test (:46-48)
    assert stitch_rings([dict(w, nodes=list(w["nodes"])) for w in RELATION_WAYS]) == [
        [1, 2, 3, 4, 5, 6, 7, 9, 1]
    ]


def test_stitch_matches_reference_function():
    ref = import_reference("municipality_split")
    import copy

    want = ref.linear_rings_assembler(copy.deepcopy(RELATION_WAYS))
    got = stitch_rings(copy.deepcopy(RELATION_WAYS))
    assert got == want


def test_polygon_assembler_reference_case():
    ways = {w["id"]: dict(w, nodes=list(w["nodes"])) for w in RELATION_WAYS}
    geom = assemble_polygon(MEMBERS, ways, NODES)
    assert geom == {
        "type": "Polygon",
        "coordinates": [[
            (10.7183, 59.8111), (10.8364, 59.8340), (10.9067, 59.8791),
            (10.8977, 59.9394), (10.8439, 59.9769), (10.7317, 59.9929),
            (10.5994, 59.9754), (10.5956, 59.8596), (10.7183, 59.8111),
        ]],
    }


def test_two_rings_make_multipolygon():
    ways = {
        600: {"id": 600, "nodes": [10, 11, 12, 10]},
        601: {"id": 601, "nodes": [20, 21, 22, 20]},
    }
    nodes = {
        10: {"lon": 0.0, "lat": 0.0}, 11: {"lon": 1.0, "lat": 0.0},
        12: {"lon": 0.0, "lat": 1.0},
        20: {"lon": 5.0, "lat": 5.0}, 21: {"lon": 6.0, "lat": 5.0},
        22: {"lon": 5.0, "lat": 6.0},
    }
    members = [
        {"type": "way", "ref": 600, "role": "outer"},
        {"type": "way", "ref": 601, "role": "outer"},
    ]
    geom = assemble_polygon(members, ways, nodes)
    assert geom["type"] == "MultiPolygon"
    assert len(geom["coordinates"]) == 2


def test_multipolygon_with_inner_ways():
    """Beyond-reference case (municipality_split.py:342 raises here): two
    outers + one inner; the hole lands in the outer that contains it."""
    ways = {
        600: {"id": 600, "nodes": [10, 11, 12, 13, 10]},
        601: {"id": 601, "nodes": [20, 21, 22, 20]},
        602: {"id": 602, "nodes": [30, 31, 32, 30]},
    }
    nodes = {
        10: {"lon": 0.0, "lat": 0.0}, 11: {"lon": 4.0, "lat": 0.0},
        12: {"lon": 4.0, "lat": 4.0}, 13: {"lon": 0.0, "lat": 4.0},
        20: {"lon": 5.0, "lat": 5.0}, 21: {"lon": 6.0, "lat": 5.0},
        22: {"lon": 5.0, "lat": 6.0},
        30: {"lon": 1.0, "lat": 1.0}, 31: {"lon": 2.0, "lat": 1.0},
        32: {"lon": 1.0, "lat": 2.0},
    }
    members = [
        {"type": "way", "ref": 600, "role": "outer"},
        {"type": "way", "ref": 601, "role": "outer"},
        {"type": "way", "ref": 602, "role": "inner"},
    ]
    geom = assemble_polygon(members, ways, nodes)
    assert geom["type"] == "MultiPolygon"
    assert len(geom["coordinates"]) == 2
    # the hole is attached to the big square (first outer), not the far one
    assert len(geom["coordinates"][0]) == 2
    assert len(geom["coordinates"][1]) == 1
    assert geom["coordinates"][0][1][0] == (1.0, 1.0)


def test_inner_ring_outside_all_outers_is_an_error():
    ways = {
        600: {"id": 600, "nodes": [10, 11, 12, 10]},
        601: {"id": 601, "nodes": [20, 21, 22, 20]},
        602: {"id": 602, "nodes": [30, 31, 32, 30]},
    }
    nodes = {
        10: {"lon": 0.0, "lat": 0.0}, 11: {"lon": 1.0, "lat": 0.0},
        12: {"lon": 0.0, "lat": 1.0},
        20: {"lon": 5.0, "lat": 5.0}, 21: {"lon": 6.0, "lat": 5.0},
        22: {"lon": 5.0, "lat": 6.0},
        30: {"lon": 50.0, "lat": 50.0}, 31: {"lon": 51.0, "lat": 50.0},
        32: {"lon": 50.0, "lat": 51.0},
    }
    members = [
        {"type": "way", "ref": 600, "role": "outer"},
        {"type": "way", "ref": 601, "role": "outer"},
        {"type": "way", "ref": 602, "role": "inner"},
    ]
    import pytest

    with pytest.raises(ValueError, match="inner ring not inside"):
        assemble_polygon(members, ways, nodes)


def test_spark_assembly(spark):
    relations = spark.createDataFrame(
        [(42, [(m["type"], m["ref"], m["role"]) for m in MEMBERS])],
        schema="id long, members array<struct<type:string, ref:bigint, role:string>>",
    )
    ways = spark.createDataFrame(
        [(w["id"], w["nodes"]) for w in RELATION_WAYS],
        schema="id long, nodes array<bigint>",
    )
    nodes = spark.createDataFrame(
        [(nid, v["lon"], v["lat"]) for nid, v in NODES.items()],
        schema="id long, lon double, lat double",
    )
    out = assemble_relations(relations, ways, nodes).collect()
    assert len(out) == 1
    r = out[0]
    assert r.error is None
    assert r.geom_type == "Polygon"
    ring = [tuple(p) for p in r.geometry[0][0]]
    assert ring == [
        (10.7183, 59.8111), (10.8364, 59.8340), (10.9067, 59.8791),
        (10.8977, 59.9394), (10.8439, 59.9769), (10.7317, 59.9929),
        (10.5994, 59.9754), (10.5956, 59.8596), (10.7183, 59.8111),
    ]
