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


# ---------------------------------------------------------------------------
# Scrape source (building_progress.py:95-173 re-expressed on html.parser)

from building2osm_spark.sources.wiki import (  # noqa: E402
    parse_progress_page,
    read_progress_pages,
)

# Hand-built rendered-page fixture exercising the bs4-walk quirks the
# reference depends on: a decoy caption-less table, entity decoding,
# first-child-<a> cells -> [[title|text]], leading whitespace before an <a>
# defeating the link form (bs4 ele.next is the string), empty count cells
# -> "0", municipality counts through int(float(.)) (decimal survives),
# '75 %' percent text inside a nested <div>, and the literal
# '{{Progress|NN}}' template body.
QUIRKS_HTML = """
<html><body><div class="mw-parser-output">
<table><tbody><tr><td>decoy table, no caption</td></tr></tbody></table>
<table class="wikitable sortable">
<caption>Import progress table - Municipalities
</caption><tbody>
<tr><th>Id</th><th>Municipality</th><th>County</th><th>M</th><th>O</th><th>B</th><th>P</th><th>U</th><th>S</th></tr>
<tr><td>0301</td><td>Oslo</td><td>Oslo</td><td>198 000.5</td><td>150 000</td><td><div class="pb">75 %</div></td><td>60 %</td><td><a href="/wiki/User:userA" title="User:userA">userA</a></td><td>started</td></tr>
<tr><td>1103</td><td>Stavanger</td><td>Rogaland</td><td></td><td></td><td></td><td></td><td> <a href="/x" title="User:spaced">spaced</a></td><td></td></tr>
<tr><td>5001</td><td>Trondheim</td><td>Tr&#248;ndelag</td><td>88 123</td><td>1 234</td><td>{{Progress|12}}</td><td>0%</td><td></td><td>completed</td></tr>
</tbody></table>
<table class="wikitable sortable">
<caption>Import progress table - Bydeler
</caption><tbody>
<tr><th>Municipality</th><th>Bydel</th><th>M</th><th>O</th><th>B</th><th>U</th><th>S</th></tr>
<tr><td>Oslo</td><td>Gamle Oslo</td><td>12 000</td><td></td><td>{{Progress|92}}</td><td><a href="/y" title="User:userA">userA</a></td><td>completed</td></tr>
</tbody></table>
</div></body></html>
"""


def test_scrape_quirks():
    muns, boroughs = parse_progress_page(QUIRKS_HTML)
    assert [m["mun_id"] for m in muns] == ["0301", "1103", "5001"]
    oslo, stv, trd = muns
    assert oslo == {
        "mun_id": "0301", "name": "Oslo", "county": "Oslo",
        "import_buildings": 198000, "osm_buildings": 150000,
        "ref_progress": 75, "ref_polygon_progress": 60,
        "user": "[[User:userA|userA]]", "status": "started",
    }
    # empty counts -> 0; empty progress -> 0; whitespace before <a> means
    # the cell is NOT a link cell (bs4 .next is the NavigableString)
    assert stv["import_buildings"] == 0 and stv["osm_buildings"] == 0
    assert stv["ref_progress"] == 0
    assert stv["user"] == "spaced"
    # entity decoded; literal template body parsed like the reference
    assert trd["county"] == "Trøndelag"
    assert trd["ref_progress"] == 12 and trd["status"] == "completed"
    assert boroughs == [{
        "mun_id": "0301", "city": "Oslo", "name": "Gamle Oslo",
        "import_buildings": 12000, "osm_buildings": 0,
        "ref_progress": 92, "ref_polygon_progress": 0,
        "user": "[[User:userA|userA]]", "status": "completed",
    }]


def _markup_to_html(markup: str) -> str:
    """Tiny MediaWiki-rendering shim for the wikitable subset the sink
    emits: {| |} |+ |- ! | lines, [[title|text]] links -> <a title=...>.
    Mirrors the served-page shape (caption + tbody, cell text ending in
    newline, link cells with the <a> as first child)."""
    import html as _h
    import re

    out = ['<html><body><div class="mw-parser-output">']
    in_table = tbody_open = row_open = False

    def _close_row():
        nonlocal row_open
        if row_open:
            out.append("</tr>")
            row_open = False

    for line in markup.split("\n"):
        if line.startswith("{|"):
            out.append('<table class="wikitable sortable">')
            in_table, tbody_open, row_open = True, False, False
        elif not in_table:
            continue
        elif line.startswith("|}"):
            _close_row()
            if tbody_open:
                out.append("</tbody>")
            out.append("</table>")
            in_table = False
        elif line.startswith("|+"):
            out.append(f"<caption>{_h.escape(line[2:])}\n</caption>")
        elif line.startswith("|-"):
            if not tbody_open:
                out.append("<tbody>")
                tbody_open = True
            _close_row()
            out.append("<tr>")
            row_open = True
        elif line.startswith("!"):
            out.append(f"<th>{_h.escape(line[1:])}\n</th>")
        elif line.startswith("|"):
            cell = line[1:]
            m = re.fullmatch(r"\[\[([^|\]]*)\|([^\]]*)\]\]", cell)
            if m:
                body = (f'<a href="/wiki/x" title="{_h.escape(m.group(1))}">'
                        f"{_h.escape(m.group(2))}</a>")
            else:
                body = _h.escape(cell)
            out.append(f"<td>{body}\n</td>")
    out.append("</div></body></html>")
    return "\n".join(out)


RT_MUNS = [
    ("0301", "Oslo", "Oslo", 198000, 150000, 75, 60, "[[User:userA|userA]]", "started"),
    ("1103", "Stavanger", "Rogaland", 54000, 54, 0, 0, "", ""),
    ("0000", "Norge", "", 252000, 150054, 33, 26, "", ""),
]
RT_BOROUGHS = [
    ("Oslo", "Gamle Oslo", 12000, 11000, 92, 80, "[[User:userA|userA]]", "completed"),
    ("Oslo", "Grünerløkka", 9000, 10, 0, 0, "", ""),
]


def test_scrape_roundtrip_with_sink(spark, tmp_path):
    """sink markup -> rendered HTML -> read_progress_pages recovers the rows
    (two snapshot files to prove the parallel multi-page scan)."""
    muns = spark.createDataFrame(
        RT_MUNS,
        schema="mun_id string, name string, county string, import_buildings long, "
        "osm_buildings long, ref_progress int, ref_polygon_progress int, "
        "user string, status string",
    )
    boroughs = spark.createDataFrame(
        RT_BOROUGHS,
        schema="city string, name string, import_buildings long, osm_buildings long, "
        "ref_progress int, ref_polygon_progress int, user string, status string",
    )
    markup_path = tmp_path / "markup.txt"
    write_progress_wiki(muns, str(markup_path), boroughs=boroughs)
    html = _markup_to_html(markup_path.read_text(encoding="utf-8"))
    snaps = tmp_path / "snapshots"
    snaps.mkdir()
    (snaps / "week01.html").write_text(html, encoding="utf-8")
    (snaps / "week02.html").write_text(html, encoding="utf-8")

    df = read_progress_pages(spark, str(snaps / "*.html"))
    rows = df.collect()
    pages = {r["page"] for r in rows}
    assert len(pages) == 2
    for page in pages:
        got_m = sorted((r for r in rows if r["page"] == page
                        and r["kind"] == "municipality"),
                       key=lambda r: r["row_idx"])
        assert [
            (r["mun_id"], r["name"], r["county"], r["import_buildings"],
             r["osm_buildings"], r["ref_progress"], r["user"], r["status"])
            for r in got_m
        ] == [(m[0], m[1], m[2], m[3], m[4], m[5], m[7], m[8]) for m in RT_MUNS]
        # the sink writes the 9-column (polygon-progress) generation, so the
        # scrape recovers polygon progress exactly
        assert [r["ref_polygon_progress"] for r in got_m] == [m[6] for m in RT_MUNS]
        assert all(r["city"] is None for r in got_m)
        got_b = sorted((r for r in rows if r["page"] == page
                        and r["kind"] == "borough"),
                       key=lambda r: r["row_idx"])
        assert [
            (r["city"], r["name"], r["import_buildings"], r["osm_buildings"],
             r["ref_progress"], r["user"], r["status"])
            for r in got_b
        ] == [(b[0], b[1], b[2], b[3], b[4], b[6], b[7]) for b in RT_BOROUGHS]
        assert [r["ref_polygon_progress"] for r in got_b] == [b[5] for b in RT_BOROUGHS]
        assert all(r["mun_id"] == "0301" and r["county"] is None for r in got_b)
