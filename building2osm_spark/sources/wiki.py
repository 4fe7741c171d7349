"""Wiki progress-table sink (SURVEY.md S11 tail).

Emits the import-progress wiki markup exactly as the reference's
output_file (building_progress.py:456-571): preamble + municipality table
+ borough ("Bydeler") table, with the {{Progress|N}} conditional cells
and space-as-thousands-separator numbers. Byte-parity-tested against the
reference's own writer on identical data.

The analytics feeding this table (counts + percentage aggregation,
building_progress.py:367-381) are the engine's progress_metrics query;
this sink collects the (tiny: one row per municipality) result and
formats driver-side — output is inherently a single wiki page, like the
GeoJSON sink (SURVEY.md S9 note). The HTTP scrape/Overpass counting of
building_progress.py:89-173 stays out of engine scope (SURVEY §2.1,
same rationale as S12).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame

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
