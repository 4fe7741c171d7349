"""Wiki progress-table sink: byte parity with building_progress.output_file."""

from __future__ import annotations

import os
import sys
import types

from building2osm_spark.sources.wiki import write_progress_wiki
from tests.conftest import import_reference

MUNS = [
    # (id, name, county, import, osm, ref%, poly%, user, status)
    ("0301", "Oslo", "Oslo", 198000, 150000, 75, 60, "userA", "started"),
    ("1103", "Stavanger", "Rogaland", 54000, 54, 0, 0, "", ""),
    ("5001", "Trondheim", "Trøndelag", 88123, 1234, 1, 0, "", "completed"),
    ("4601", "Bergen", "Vestland", 120000, 0, 0, 0, "userB", ""),
    ("0000", "Norge", "", 460123, 151288, 33, 26, "", ""),
]
BOROUGHS = [
    ("Oslo", "Gamle Oslo", 12000, 11000, 92, 80, "userA", "completed"),
    ("Oslo", "Grünerløkka", 9000, 10, 0, 0, "", ""),
]


def _run_reference(tmp_path) -> str:
    """Drive the reference's own output_file on identical data."""
    sys.modules.setdefault("bs4", types.SimpleNamespace(BeautifulSoup=object))
    ref = import_reference("building_progress")
    ref.municipalities = {
        m[0]: {
            "name": m[1], "county": m[2], "import_buildings": m[3],
            "osm_buildings": m[4], "ref_progress": m[5],
            "ref_polygon_progress": m[6], "user": m[7], "status": m[8],
        }
        for m in MUNS
    }
    ref.municipalities["0301"]["subdivision"] = [
        {
            "name": b[1], "import_buildings": b[2], "osm_buildings": b[3],
            "ref_progress": b[4], "ref_polygon_progress": b[5],
            "user": b[6], "status": b[7],
        }
        for b in BOROUGHS
    ]
    ref.norway_id = "0000"
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ref.output_file()
    finally:
        os.chdir(cwd)
    return open(tmp_path / "building_import_progress.txt", encoding="utf-8").read()


def test_wiki_markup_byte_parity(spark, tmp_path):
    want = _run_reference(tmp_path)
    muns = spark.createDataFrame(
        MUNS,
        schema="mun_id string, name string, county string, import_buildings long, "
        "osm_buildings long, ref_progress int, ref_polygon_progress int, "
        "user string, status string",
    )
    boroughs = spark.createDataFrame(
        BOROUGHS,
        schema="city string, name string, import_buildings long, osm_buildings long, "
        "ref_progress int, ref_polygon_progress int, user string, status string",
    )
    out = str(tmp_path / "engine_progress.txt")
    n = write_progress_wiki(muns, out, boroughs=boroughs)
    assert n == len(MUNS) + len(BOROUGHS)
    got = open(out, encoding="utf-8").read()
    assert got == want
