"""Overpass JSON scan (S7 live shape) → conflation-ready buildings."""

from __future__ import annotations

import json

from building2osm_spark.sources.overpass import (
    osm_buildings_from_overpass,
    read_overpass_json,
)


def _response() -> dict:
    # square way -101 (building), relation-member way -102 excluded,
    # open way -103 excluded, untagged way -104 excluded
    nodes = [
        {"type": "node", "id": i + 1, "lat": 59.0 + 0.0002 * (i // 2),
         "lon": 10.0 + 0.0003 * (i % 2)}
        for i in range(4)
    ]
    return {
        "version": 0.6,
        "elements": nodes
        + [
            {"type": "way", "id": -101, "nodes": [1, 2, 4, 3, 1],
             "tags": {"building": "house", "ref:bygningsnr": "777", "name": "A"}},
            {"type": "way", "id": -102, "nodes": [1, 2, 4, 1],
             "tags": {"building": "yes"}},
            {"type": "way", "id": -103, "nodes": [1, 2, 4],
             "tags": {"building": "yes"}},
            {"type": "way", "id": -104, "nodes": [1, 2, 3, 1]},
            {"type": "relation", "id": -201,
             "members": [{"type": "way", "ref": -102, "role": "outer"}],
             "tags": {"type": "multipolygon", "building": "yes"}},
        ],
    }


def test_overpass_scan_to_buildings(spark, tmp_path):
    p = tmp_path / "overpass.json"
    p.write_text(json.dumps(_response()))

    elements = read_overpass_json(spark, str(p))
    assert elements.count() == 9
    out = osm_buildings_from_overpass(spark, str(p)).collect()
    # only way -101 survives: -102 is a relation member, -103 open, -104 untagged
    assert [r["osm_id"] for r in out] == [-101]
    b = out[0]
    assert b["ref_tag"] == "777"
    assert b["tagged"] is True  # name + ref tags beyond building/source/addr
    assert len(b["ring"]) == 5 and b["ring"][0] == b["ring"][-1]
    assert b["area"] > 0
    assert 10.0 <= b["c_lon"] <= 10.001 and 59.0 <= b["c_lat"] <= 59.001
