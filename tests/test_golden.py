"""Golden regression: the full municipality pipeline's WKB output is
byte-stable (sha256 per building) across engine changes. The golden file
was produced by the pipeline whose rectify/simplify stages are themselves
parity-tested tuple-for-tuple against the reference (test_geopasses.py),
so this doubles as a frozen byte-level contract — SURVEY.md §5.2."""

from __future__ import annotations

import hashlib
import json
import os

from building2osm_spark.plans.pipeline import municipality_pipeline
from building2osm_spark.sources import fixtures as FX

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "municipality_wkb.json")


def test_municipality_pipeline_wkb_golden(spark):
    want = json.load(open(GOLDEN))
    out = municipality_pipeline(spark, FX.spark_buildings(spark, 140))
    rows = out.select("ref", "wkb", "rectified").collect()
    assert len(rows) == len(want) == 140
    for r in rows:
        w_hash, w_status = want[r["ref"]]
        assert r["rectified"] == w_status, r["ref"]
        assert hashlib.sha256(bytes(r["wkb"])).hexdigest() == w_hash, r["ref"]
