"""Wiki progress-table source + sink (SURVEY.md S11).

Sink: emits the import-progress wiki markup exactly as the reference's
output_file (building_progress.py:456-571): preamble + municipality table
+ borough ("Bydeler") table, with the {{Progress|N}} conditional cells
and space-as-thousands-separator numbers. Byte-parity-tested against the
reference's own writer on identical data.

Source: parses SAVED progress-page HTML (the page load_progress_page
downloads, building_progress.py:89-173) into structured rows, executor-
side over binaryFile rows so historical page snapshots parse in parallel.
The table navigation mirrors the reference's bs4 walk (caption-matched
tables, tbody rows [1:], td cells, first-child-<a> cells rendered as
[[title|text]] wiki links) with a stdlib html.parser extractor — bs4 is
not in the sandbox, and the cell/number coercion quirks (empty counts →
"0", "NN %" vs "{{Progress|NN}}" progress text, space thousands
separators) are reproduced from the reference line-by-line. The HTTP
fetch itself stays out of engine scope (S12, SURVEY §2.1).

The analytics feeding the sink table (counts + percentage aggregation,
building_progress.py:367-381) are the engine's progress_metrics query;
the sink collects the (tiny: one row per municipality) result and
formats driver-side — output is inherently a single wiki page, like the
GeoJSON sink (SURVEY.md S9 note).
"""

from __future__ import annotations

from datetime import date
from html.parser import HTMLParser
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

PREAMBLE = (
    'Please read instructions in the [[Import/Catalogue/Norway Building Import|'
    'import plan]] (workflow section). Tagged import files per municipality and '
    '"bydel" are in [https://www.jottacloud.com/s/'
    '059f4e21889c60d4e4aaa64cc857322b134 this folder].\n\n'
    "How to use the table below:\n\n"
    '* "Status" (last column) may be used to indicate if import of a municipality '
    'is "started" or "completed", to avoid conflicting imports.\n'
    '* "Matrikkel buildings" is the number of buildings in the Cadastral registry '
    '("Matrikkelen"), available for import.\n'
    '* "Total progress" is the number of buildings with the "ref:bygningsnr" tag '
    'in OSM in percentage of "Matrikkel buildings".\n'
    '* "Polygon progress" is the same, but only for building polygons/ways, '
    "excluding nodes.\n\n"
    'Some larger municipalities (Oslo, Bergen, Trondheim, Stavanger, Drammen) have '
    'been divided into smaller "bydel" parts in this table. Please see second '
    "table of this page.\n\n"
)


def _thousands(n: int) -> str:
    return f"{n:,}".replace(",", " ")


def _progress_cell(progress: int, user: str) -> str:
    if progress > 0 or user:
        return "|{{Progress|%d}}\n" % progress
    return "|0%\n"


def write_progress_wiki(
    municipalities: DataFrame,
    path: str,
    *,
    boroughs: DataFrame | None = None,
    today: str | None = None,
) -> int:
    """municipalities(mun_id, name, county, import_buildings, osm_buildings,
    ref_progress, ref_polygon_progress, user, status) — in output order —
    plus optional boroughs(city, name, import_buildings, osm_buildings,
    ref_progress, ref_polygon_progress, user, status). Returns the row
    count. Collect is by design: one row per municipality (≤ 360)."""
    today = today or date.today().strftime("%Y-%m-%d")
    rows = municipalities.collect()
    with open(path, "w", encoding="utf-8") as f:
        f.write(PREAMBLE)
        f.write("Table numbers updated %s. Updates once a week.\n\n" % today)

        f.write('{| class="wikitable sortable" style="text-align: right;"\n')
        f.write("|+Import progress table - Municipalities\n")
        f.write("|-\n")
        f.write("!Id\n")
        f.write("!Municipality\n")
        f.write("!County\n")
        f.write('! data-sort-type="number" |Matrikkel buildings\n')
        f.write('! data-sort-type="number" |OSM buildings\n')
        f.write('! data-sort-type="number" |Building progress\n')
        f.write('! data-sort-type="number" |Polygon progress\n')
        f.write("!Responsible user(s)\n")
        f.write("!Status\n")
        for r in rows:
            f.write("|-\n")
            f.write(f"|{r['mun_id']}\n")
            f.write(f"|{r['name']}\n")
            f.write(f"|{r['county']}\n")
            f.write(f"|{_thousands(r['import_buildings'])}\n")
            f.write(f"|{_thousands(r['osm_buildings'])}\n")
            f.write(_progress_cell(r["ref_progress"], r["user"]))
            f.write(_progress_cell(r["ref_polygon_progress"], r["user"]))
            f.write(f"|{r['user']}\n")
            f.write(f"|{r['status']}\n")
        f.write("|}\n\n")

        f.write("==Bydeler==\n")
        f.write(
            "Note: Most of Oslo inside of Ring 3 is already imported except East "
            "side, however needs conflation with ''ref:bygningsnr'' and "
            "''building:levels''.\n"
        )
        f.write('{| class="wikitable sortable" style="text-align: right;"\n')
        f.write("|+Import progress table - Bydeler\n")
        f.write("|-\n")
        f.write("!Municipality\n")
        f.write("!Bydel\n")
        f.write('! data-sort-type="number" |Matrikkel buildings\n')
        f.write('! data-sort-type="number" |OSM buildings\n')
        f.write('! data-sort-type="number" |Building progress\n')
        f.write('! data-sort-type="number" |Polygon progress\n')
        f.write("!Responsible user(s)\n")
        f.write("!Status\n")
        n_boroughs = 0
        if boroughs is not None:
            for r in boroughs.collect():
                n_boroughs += 1
                f.write("|-\n")
                f.write(f"|{r['city']}\n")
                f.write(f"|{r['name']}\n")
                f.write(f"|{_thousands(r['import_buildings'])}\n")
                f.write(f"|{_thousands(r['osm_buildings'])}\n")
                f.write(_progress_cell(r["ref_progress"], r["user"]))
                f.write(_progress_cell(r["ref_polygon_progress"], r["user"]))
                f.write(f"|{r['user']}\n")
                f.write(f"|{r['status']}\n")
        f.write("|}\n")
    return len(rows) + n_boroughs


# --------------------------------------------------------------------------
# Scrape source: saved progress-page HTML -> structured rows
# (reference walk: building_progress.py:95-173, re-expressed on html.parser)

MUNICIPALITY_CAPTION = "Import progress table - Municipalities"
BOROUGH_CAPTION = "Import progress table - Bydeler"

PROGRESS_PAGE_SCHEMA = (
    "page string, kind string, row_idx int, mun_id string, city string, "
    "name string, county string, import_buildings long, osm_buildings long, "
    "ref_progress int, ref_polygon_progress int, user string, status string"
)
_PAGE_COLS = [f.split()[0] for f in PROGRESS_PAGE_SCHEMA.split(", ")]


class _TableExtractor(HTMLParser):
    """Stand-in for the reference's bs4 walk (building_progress.py:100-110).

    Collects every <table> with its <caption> text and, per direct row of
    that table, the <td> cells — each cell recording its full descendant
    text (bs4 ``ele.text``) and, when the cell's FIRST child node is an
    ``<a>`` tag (bs4 ``ele.next.name == 'a'`` — any leading string child,
    even whitespace, defeats the link form, exactly as ``.next`` would),
    that link's title attribute and anchor text. Nested tables get their
    own context via a stack, so a table inside a cell cannot corrupt the
    outer row walk (bs4's ``find_all("tr", recursive=False)``); its text
    is NOT folded back into the outer cell — acceptable because no
    progress-page cell nests a table. ``<th>`` cells are skipped like
    ``row.find_all('td')`` does.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[dict] = []
        self._stack: list[dict] = []

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._stack.append(
                {"caption": [], "in_caption": False, "rows": [], "row": None, "cell": None}
            )
            return
        if not self._stack:
            return
        st = self._stack[-1]
        if tag == "caption":
            st["in_caption"] = True
            return
        if tag == "tr":
            if st["row"] is None:
                st["row"] = []
            return
        if tag == "td" and st["row"] is not None and st["cell"] is None:
            st["cell"] = {
                "text": [], "seen": False, "is_link": False,
                "a_title": "", "a_text": [], "in_a": False,
            }
            return
        cell = st["cell"]
        if cell is not None:
            if not cell["seen"]:
                cell["seen"] = True
                if tag == "a":
                    cell["is_link"] = True
                    cell["a_title"] = dict(attrs).get("title", "")
                    cell["in_a"] = True

    def handle_endtag(self, tag):
        if tag == "table":
            if self._stack:
                st = self._stack.pop()
                self.tables.append(
                    {"caption": "".join(st["caption"]), "rows": st["rows"]}
                )
            return
        if not self._stack:
            return
        st = self._stack[-1]
        if tag == "caption":
            st["in_caption"] = False
        elif tag == "a" and st["cell"] is not None:
            st["cell"]["in_a"] = False
        elif tag == "td":
            if st["cell"] is not None and st["row"] is not None:
                st["row"].append(st["cell"])
            st["cell"] = None
        elif tag == "tr":
            if st["row"] is not None:
                st["rows"].append(st["row"])
            st["row"] = None

    def handle_data(self, data):
        if not self._stack:
            return
        st = self._stack[-1]
        if st["in_caption"]:
            st["caption"].append(data)
            return
        cell = st["cell"]
        if cell is None:
            return
        if not cell["seen"]:
            cell["seen"] = True  # first child is a string -> not a link cell
        if cell["in_a"]:
            cell["a_text"].append(data)
        cell["text"].append(data)


def _row_cols(row: list[dict]) -> list[str]:
    """building_progress.py:101-105 — the per-td comprehension: a cell whose
    first child is a link renders ``[[title|text]]`` (link text NOT
    stripped, like ``link.text``); any other cell is its text, stripped."""
    return [
        "[[%s|%s]]" % (c["a_title"], "".join(c["a_text"]))
        if c["is_link"] else "".join(c["text"]).strip()
        for c in row
    ]


def _parse_progress(text: str) -> int:
    """building_progress.py:111-116 / 145-150: '' -> 0, 'NN %' -> int, and a
    literal '{{Progress|NN}}' template body -> NN."""
    if text.strip() == "":
        return 0
    if "%" in text:
        return int(float(text.strip("%").replace(" ", "")))
    return int(text.split("|")[1].strip("}"))


def _find_table(tables: list[dict], caption: str) -> dict:
    for t in tables:
        if t["caption"].strip() == caption:
            return t
    raise ValueError(f"progress page has no table captioned {caption!r}")


def parse_progress_page(html: str) -> tuple[list[dict], list[dict]]:
    """Parse one saved progress-page HTML document into
    (municipality rows, borough rows) with the reference's exact cell
    coercions (building_progress.py:95-173): empty count cells -> "0",
    count text space-thousands-stripped (municipality counts through
    int(float(.)), borough counts through int(.) — the reference differs),
    user cells stripped, boroughs resolved to their city's id via the
    municipality table parsed from the same page."""
    ex = _TableExtractor()
    ex.feed(html)
    ex.close()

    muns: list[dict] = []
    table = _find_table(ex.tables, MUNICIPALITY_CAPTION)
    for row in table["rows"][1:]:  # [1:] skips the header row, as the reference
        cols = _row_cols(row)
        for i in (3, 4):
            if not cols[i]:
                cols[i] = "0"
        # Page-generation detection: the as-committed reference scrape reads
        # the PRE-polygon-column page (8 cells: progress@5 user@6 status@7,
        # building_progress.py:111-127) while its own writer emits 9 cells
        # with "Polygon progress" at index 6 (:482-519) — transitional code
        # (note the commented-out `# [2:]` at :100). The engine reads both
        # generations, keyed on the row's td count, and recovers the polygon
        # progress when the column exists.
        if len(cols) == 9:
            poly, user_i, status_i = _parse_progress(cols[6]), 7, 8
        elif len(cols) == 8:
            poly, user_i, status_i = 0, 6, 7
        else:
            raise ValueError(
                f"municipality row has {len(cols)} cells (want 8 or 9): {cols!r}"
            )
        muns.append(
            {
                "mun_id": cols[0],
                "name": cols[1],
                "county": cols[2],
                "import_buildings": int(float(cols[3].replace(" ", ""))),
                "osm_buildings": int(float(cols[4].replace(" ", ""))),
                "ref_progress": _parse_progress(cols[5]),
                "ref_polygon_progress": poly,
                "user": cols[user_i].strip(),
                "status": cols[status_i],
            }
        )
    mun_ids = {m["name"]: m["mun_id"] for m in muns}

    boroughs: list[dict] = []
    table = _find_table(ex.tables, BOROUGH_CAPTION)
    for row in table["rows"][1:]:
        cols = _row_cols(row)
        for i in (2, 3):
            if not cols[i]:
                cols[i] = "0"
        if cols[0] not in mun_ids:
            raise KeyError(
                f"borough row references unknown municipality {cols[0]!r}"
            )
        if len(cols) == 8:  # current writer layout, polygon column @5
            poly, user_i, status_i = _parse_progress(cols[5]), 6, 7
        elif len(cols) == 7:  # pre-polygon generation (reference :141-157)
            poly, user_i, status_i = 0, 5, 6
        else:
            raise ValueError(
                f"borough row has {len(cols)} cells (want 7 or 8): {cols!r}"
            )
        boroughs.append(
            {
                "mun_id": mun_ids[cols[0]],
                "city": cols[0],
                "name": cols[1],
                "import_buildings": int(cols[2].replace(" ", "")),
                "osm_buildings": int(cols[3].replace(" ", "")),
                "ref_progress": _parse_progress(cols[4]),
                "ref_polygon_progress": poly,
                "user": cols[user_i].strip(),
                "status": cols[status_i],
            }
        )
    return muns, boroughs


def read_progress_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan saved progress-page HTML snapshots (file, directory or glob)
    into one row per table line: kind='municipality' rows carry county and
    their own mun_id; kind='borough' rows carry the city name and the
    city's mun_id. row_idx preserves each table's top-to-bottom order
    within its page. Parsing runs executor-side over binaryFile rows, so
    historical snapshots parse in parallel; each page is independent
    (the borough->city resolution only needs its own page's first table).
    """
    binary = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: list[dict] = []
            for page, content in zip(pdf["path"], pdf["content"]):
                muns, boroughs = parse_progress_page(bytes(content).decode("utf-8"))
                for i, m in enumerate(muns):
                    out.append({"page": page, "kind": "municipality",
                                "row_idx": i, "city": None, **m})
                for i, b in enumerate(boroughs):
                    out.append({"page": page, "kind": "borough",
                                "row_idx": i, "county": None, **b})
            yield pd.DataFrame(out, columns=_PAGE_COLS)

    return binary.mapInPandas(_parse, schema=PROGRESS_PAGE_SCHEMA)
