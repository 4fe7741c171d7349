"""CLI smoke tests (the three reference entry points, table-in/table-out)."""

from __future__ import annotations

import json
import os

from building2osm_spark import cli
from building2osm_spark.sources import fixtures as FX


def test_cli_process(spark, tmp_path):
    src = str(tmp_path / "b.parquet")
    FX.spark_buildings(spark, 30).write.parquet(src)
    out = str(tmp_path / "out")
    rc = cli.main(["--cores", "4", "process", "--buildings", src, "--out", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "buildings.geojson"))
    data = json.load(open(os.path.join(out, "buildings.geojson")))
    assert len(data["features"]) == 30
    assert spark.read.parquet(os.path.join(out, "buildings.parquet")).count() == 30


def test_cli_process_original(spark, tmp_path):
    """--original (reference -original, building2osm.py:1359,1402): no
    rectify/simplify — output geometry is the input geometry byte-for-byte
    after the unconditional 7-decimal output rounding — the file gets the
    reference's _original suffix, and SEFRAK survives the uppercase drop."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "b.parquet")
    b = FX.spark_buildings(spark, 30).withColumn("sefrak", F.lit("1234-0001-2"))
    b.write.parquet(src)
    out = str(tmp_path / "out")
    rc = cli.main(
        ["--cores", "4", "process", "--buildings", src, "--out", out, "--original"]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(out, "buildings_original.geojson"))
    data = json.load(open(os.path.join(out, "buildings_original.geojson")))
    assert len(data["features"]) == 30
    assert all(f["properties"].get("SEFRAK") == "1234-0001-2" for f in data["features"])
    inp = {
        r["ref"]: [[round(c, 7) for c in p] for ring in r["geometry"] for p in ring]
        for r in b.select("ref", "geometry").collect()
    }
    got = {
        r["ref"]: [list(p) for ring in r["geometry"] for p in ring]
        for r in spark.read.parquet(os.path.join(out, "buildings.parquet"))
        .select("ref", "geometry")
        .collect()
    }
    assert got == inp


def test_cli_merge(spark, tmp_path):
    osm_pdf, import_pdf = FX.conflation_pdfs(32)
    osm_p = str(tmp_path / "osm.parquet")
    imp_p = str(tmp_path / "imp.parquet")
    spark.createDataFrame(osm_pdf, schema=FX.OSM_CONFLATE_SCHEMA).write.parquet(osm_p)
    spark.createDataFrame(import_pdf, schema=FX.IMPORT_CONFLATE_SCHEMA).write.parquet(imp_p)
    out = str(tmp_path / "out")
    rc = cli.main(["--cores", "4", "merge", "--osm", osm_p, "--imports", imp_p, "--out", out])
    assert rc == 0
    matches = spark.read.parquet(os.path.join(out, "matches.parquet"))
    assert matches.count() > 0


def test_cli_split_with_resume(spark, tmp_path):
    pts_p = str(tmp_path / "pts.parquet")
    d_p = str(tmp_path / "d.parquet")
    spark.createDataFrame(
        FX.images_pdf(120, with_loc=True)[["image_id", "lon", "lat"]]
    ).write.parquet(pts_p)
    spark.createDataFrame(
        FX.subdivisions_pdf(2, 2), schema=FX.SUBDIVISIONS_SCHEMA
    ).write.parquet(d_p)
    out = str(tmp_path / "out")
    snap = str(tmp_path / "snap")
    rc = cli.main(
        ["--cores", "4", "split", "--points", pts_p, "--districts", d_p,
         "--out", out, "--resume-root", snap]
    )
    assert rc == 0
    assigned = spark.read.parquet(os.path.join(out, "assignments.parquet"))
    assert assigned.count() == 120
    # second run: resume commits nothing new
    from building2osm_spark.sources.checkpoint import SnapshotStore

    store = SnapshotStore(snap)
    assert store.read(spark, "split").count() > 0


def test_cli_merge_writes_merged_actions(spark, tmp_path):
    """merge must produce the building_merge output surface: merged.parquet
    with action='modify' rows (merged tag maps) for matches and
    action='new' rows for unmatched imports."""
    osm_pdf, import_pdf = FX.conflation_pdfs(32)
    osm_p = str(tmp_path / "osm2.parquet")
    imp_p = str(tmp_path / "imp2.parquet")
    spark.createDataFrame(osm_pdf, schema=FX.OSM_CONFLATE_SCHEMA).write.parquet(osm_p)
    spark.createDataFrame(import_pdf, schema=FX.IMPORT_CONFLATE_SCHEMA).write.parquet(imp_p)
    out = str(tmp_path / "out2")
    rc = cli.main(["--cores", "4", "merge", "--osm", osm_p, "--imports", imp_p, "--out", out])
    assert rc == 0
    merged = spark.read.parquet(os.path.join(out, "merged.parquet"))
    actions = {r["action"] for r in merged.select("action").distinct().collect()}
    assert "modify" in actions
    n_imports = spark.read.parquet(imp_p).count()
    assert merged.count() == n_imports  # every import resolves to modify or new
    mod = merged.filter("action = 'modify'").first()
    assert mod["tags"].get("building")  # merged tag map carries building

    # --debug additionally writes the full per-OSM-row diagnostic surface
    out3 = str(tmp_path / "out3")
    rc = cli.main(
        ["--cores", "4", "merge", "--osm", osm_p, "--imports", imp_p,
         "--out", out3, "--debug"]
    )
    assert rc == 0
    dbg = spark.read.parquet(os.path.join(out3, "debug_tags.parquet"))
    tags = [dict(r["dbg"]) for r in dbg.collect()]
    assert tags and all("HAUSDORFF" in d for d in tags)

    # --greedy-debug swaps in the shrinking-set spray; on this unique-best
    # corpus it must agree with the order-free surface exactly
    out4 = str(tmp_path / "out4")
    rc = cli.main(
        ["--cores", "4", "merge", "--osm", osm_p, "--imports", imp_p,
         "--out", out4, "--debug", "--greedy-debug"]
    )
    assert rc == 0
    dbg4 = spark.read.parquet(os.path.join(out4, "debug_tags.parquet"))
    got4 = {r["osm_id"]: dict(r["dbg"]) for r in dbg4.collect()}
    got3 = {r["osm_id"]: dict(r["dbg"]) for r in dbg.collect()}
    assert got4 == got3


def test_geojson_suffix_precedence():
    """Reference elif chain (building2osm.py:1279-1284): debug > verify >
    original — combined flags pick the highest-precedence suffix."""
    from building2osm_spark.cli import _geojson_name

    assert _geojson_name(True, True, True) == "buildings_debug.geojson"
    assert _geojson_name(False, True, True) == "buildings_verify.geojson"
    assert _geojson_name(False, False, True) == "buildings_original.geojson"
    assert _geojson_name(False, False, False) == "buildings.geojson"


def test_cli_merge_osm_base(spark, tmp_path):
    """--osm-base: first run builds the bucketed base from --osm, second
    run reads the base alone (no --osm) and produces identical matches —
    the standing-pipeline surface for repeated merges vs a static OSM
    snapshot."""
    osm_pdf, import_pdf = FX.conflation_pdfs(32)
    osm_p = str(tmp_path / "osm.parquet")
    imp_p = str(tmp_path / "imp.parquet")
    spark.createDataFrame(osm_pdf, schema=FX.OSM_CONFLATE_SCHEMA).write.parquet(osm_p)
    spark.createDataFrame(import_pdf, schema=FX.IMPORT_CONFLATE_SCHEMA).write.parquet(imp_p)
    prefix = "clitest_base"
    from building2osm_spark.sources.bucketed import drop_bucketed

    # a failed earlier run must not leave the base behind (the shared
    # warehouse persists across JVMs — a leftover base would silently
    # skip the build path on the next run): clean before AND after
    drop_bucketed(spark, f"{prefix}_osm")
    try:
        out1 = str(tmp_path / "out1")
        rc = cli.main(["--cores", "4", "merge", "--osm", osm_p, "--osm-base", prefix,
                       "--imports", imp_p, "--out", out1])
        assert rc == 0
        assert spark.catalog.tableExists(f"{prefix}_osm")
        out2 = str(tmp_path / "out2")
        rc = cli.main(["--cores", "4", "merge", "--osm-base", prefix,
                       "--imports", imp_p, "--out", out2])
        assert rc == 0
        m1 = sorted(map(tuple, spark.read.parquet(os.path.join(out1, "matches.parquet")).collect()))
        m2 = sorted(map(tuple, spark.read.parquet(os.path.join(out2, "matches.parquet")).collect()))
        assert m1 == m2 and len(m1) > 0
        # passing a fresh --osm while the base exists is NOT silent: the
        # base wins, but a loud warning names the ignored snapshot
        import io
        import sys as _sys

        err = io.StringIO()
        old = _sys.stderr
        _sys.stderr = err
        try:
            rc = cli.main(["--cores", "4", "merge", "--osm", osm_p,
                           "--osm-base", prefix, "--imports", imp_p,
                           "--out", str(tmp_path / "out4")])
        finally:
            _sys.stderr = old
        assert rc == 0
        assert "NOT read" in err.getvalue() and osm_p in err.getvalue()
        # neither --osm nor --osm-base is an error
        import pytest
        with pytest.raises(SystemExit, match="osm"):
            cli.main(["merge", "--imports", imp_p, "--out", str(tmp_path / "o3")])
        # a non-identifier prefix fails with a clean CLI message, not a
        # SQL ParseException
        with pytest.raises(SystemExit, match="plain identifier"):
            cli.main(["merge", "--osm", osm_p, "--osm-base", "oslo-2026",
                      "--imports", imp_p, "--out", str(tmp_path / "o5")])
    finally:
        drop_bucketed(spark, f"{prefix}_osm")
