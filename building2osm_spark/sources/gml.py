"""GML ingest kernels (SURVEY.md S3/S4/S8 — the 'real files' path).

The reference consumes three GML shapes over HTTP; the engine parses the
same shapes from files, executor-side, so a user can point the engine at
downloaded cadastre archives instead of the fixture tables:

  * cadastral building points (Matrikkelen-Bygningspunkt,
    building2osm.py:565-683): featureMember/Bygning with a UTM-33
    representasjonspunkt and the type/status/date/heritage/sefrak/
    dwelling attributes;
  * WFS building polygons (inspire-bu-core2d, building2osm.py:406-463):
    <bu-base:reference> + one <gml:posList> per ring, EPSG:4326, with the
    reference's consecutive-duplicate/backtrack dedupe (parse_polygon,
    building2osm.py:296-315 → geom.dedupe_consecutive);
  * district surfaces (municipality_split.py:472-560): gml:Polygon /
    gml:Surface with PolygonPatch exterior+interior rings, srsName-driven
    UTM zone → Polygon/MultiPolygon.

Scale shape: input is a DataFrame of (path, content) rows — exactly what
`spark.read.format("binaryFile")` yields over a directory of GML/XML
files — and each file parses inside one `mapInPandas` task (stdlib
ElementTree; the cadastre publishes one archive per municipality, so file
granularity IS the parallelism unit). Zip members are decompressed
in-task. Nothing is collected to the driver.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import geom as G
from .. import utm as UTM

NS_GML = "http://www.opengis.net/gml/3.2"
NS_APP_BUILDING = (
    "http://skjema.geonorge.no/SOSI/produktspesifikasjon/"
    "Matrikkelen-Bygningspunkt/20211101"
)

CADASTRAL_SCHEMA = (
    "ref string, lon double, lat double, building_type string, status string, "
    "date string, heritage boolean, sefrak string, dwellings array<string>, "
    "source_file string"
)
WFS_POLYGON_SCHEMA = "ref string, geometry array<array<array<double>>>, source_file string"
DISTRICT_SCHEMA = (
    "name string, geom_type string, geometry array<array<array<array<double>>>>, "
    "source_file string"
)

COORD_DECIMALS = 7  # building2osm.py:36


def _xml_roots(path: str, content: bytes):
    """Yield parsed roots for a GML file or every member of a .zip archive
    (the cadastre ships zips, building2osm.py:590-601)."""
    import xml.etree.ElementTree as ET

    if path.endswith(".zip"):
        zf = zipfile.ZipFile(io.BytesIO(content))
        for info in zf.infolist():
            # a user-rezipped archive can carry folder entries, schema
            # .xsd files or __MACOSX noise — parsing those would fail the
            # whole task; only GML/XML members hold features
            if info.is_dir() or not info.filename.lower().endswith((".gml", ".xml")):
                continue
            with zf.open(info) as f:
                yield ET.parse(f).getroot()
    else:
        yield ET.fromstring(content)


# ---------------------------------------------------------------------------
# S3 — cadastral building points
# ---------------------------------------------------------------------------


def _parse_cadastral(root, source: str) -> list[dict]:
    ns = {"gml": NS_GML, "app": NS_APP_BUILDING}
    feats: list[dict] = []
    xs: list[float] = []
    ys: list[float] = []
    for feature in root.iter(f"{{{NS_GML}}}featureMember"):
        b = feature.find("app:Bygning", ns)
        if b is None:
            continue
        ref = b.find("app:bygningsnummer", ns).text
        pos = b.find("app:representasjonspunkt/gml:Point/gml:pos", ns).text.split()
        xs.append(float(pos[0]))
        ys.append(float(pos[1]))
        date_el = b.find("app:oppdateringsdato", ns)
        heritage_el = b.find("app:harKulturminne", ns)
        sefrak = b.find("app:sefrakIdent/app:SefrakIdent", ns)
        sefrak_txt = None
        if sefrak is not None:
            sefrak_txt = "%s-%s-%s" % (
                sefrak.find("app:sefrakKommune", ns).text,
                sefrak.find("app:registreringskretsnummer", ns).text,
                sefrak.find("app:huslopenummer", ns).text,
            )
        dwellings = [
            d.find("app:Bruksenhet/app:bruksenhetId", ns).text
            for d in b.findall("app:bruksenhet", ns)
            if d.find("app:Bruksenhet/app:bruksenhetId", ns) is not None
        ]
        feats.append({
            "ref": ref,
            "building_type": b.find("app:bygningstype", ns).text,
            "status": b.find("app:bygningsstatus", ns).text,
            "date": date_el.text[:10] if date_el is not None and date_el.text else None,
            "heritage": heritage_el is not None and heritage_el.text == "true",
            "sefrak": sefrak_txt,
            "dwellings": dwellings,
            "source_file": source,
        })
    if not feats:
        return feats
    # reference reprojects UTM 33N → WGS84 and rounds to 7 decimals
    # (building2osm.py:619-621); ONE vectorized reprojection for the whole
    # file — per-feature 1-element numpy calls put allocation + series
    # overhead on the hottest ingest loop (~100k+ features per municipality
    # archive). Rounding stays CPython round() for reference parity.
    lat, lon = UTM.utm_to_latlon(
        np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64), 33
    )
    for row, lo, la in zip(feats, lon, lat):
        row["lon"] = round(float(lo), COORD_DECIMALS)
        row["lat"] = round(float(la), COORD_DECIMALS)
    return feats


def parse_cadastral_gml(files: DataFrame) -> DataFrame:
    """files(path, content) — e.g. spark.read.format('binaryFile') — →
    cadastral building point rows (CADASTRAL_SCHEMA)."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for root in _xml_roots(path, bytes(content)):
                    rows.extend(_parse_cadastral(root, path))
            if rows:
                yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(kernel, schema=CADASTRAL_SCHEMA)


# ---------------------------------------------------------------------------
# S4 — WFS building polygons
# ---------------------------------------------------------------------------


def _parse_wfs_polygons(text: str, source: str) -> Iterator[dict]:
    """Line-oriented scan exactly like the reference's streaming parse
    (building2osm.py:420-447): a reference line opens a feature, each
    posList appends one deduped ring, </wfs:member> closes it."""
    ref = None
    rings: list[list[list[float]]] = []
    # `>= 0`, not the reference's `> 0` (building2osm.py:426,440): the
    # reference only ever reads one server's indented output, where tags
    # never start a line; a minified/re-serialized file would silently
    # lose features under `> 0`. All parity fixtures are indented, so the
    # two forms agree on them.
    for line in text.splitlines():
        i = line.find("<bu-base:reference>")
        if i >= 0:
            j = line.find("<", i + 19)
            ref = line[i + 19 : j]
            rings = []
        i = line.find("<gml:posList>")
        if i >= 0:
            j = line.find("<", i + 13)
            vals = [float(v) for v in line[i + 13 : j].split()]
            pairs = np.asarray(vals, dtype=np.float64).reshape(-1, 2)
            rings.append(G.dedupe_consecutive(pairs).tolist())
        if "</wfs:member>" in line and ref is not None and rings:
            yield {"ref": ref, "geometry": rings, "source_file": source}
            ref, rings = None, []


def parse_wfs_building_gml(files: DataFrame) -> DataFrame:
    """files(path, content) → (ref, geometry Polygon rings, source_file)."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_wfs_polygons(bytes(content).decode("utf-8"), path))
            if rows:
                yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(kernel, schema=WFS_POLYGON_SCHEMA)


# ---------------------------------------------------------------------------
# S8 — district surfaces (Polygon / Surface with patches)
# ---------------------------------------------------------------------------


def _ring_from_poslist(el, epsg: int) -> list[list[float]]:
    vals = [float(v) for v in el.text.split()]
    pts = np.asarray(vals, dtype=np.float64).reshape(-1, 2)
    if epsg == 4326:
        lat, lon = pts[:, 0], pts[:, 1]
    else:
        lat, lon = UTM.utm_to_latlon(pts[:, 0], pts[:, 1], epsg % 100)
    return np.stack([lon, lat], axis=1).tolist()


def _patch_rings(patch, ns, epsg: int) -> list[list[list[float]]]:
    rings = [_ring_from_poslist(patch.find("./gml:exterior//gml:posList", ns), epsg)]
    for inner in patch.findall("./gml:interior", ns):
        rings.append(_ring_from_poslist(inner.find(".//gml:posList", ns), epsg))
    return rings


def _parse_districts(root, name_tag: str, feature_tag: str, geom_tag: str,
                     app_ns: str, source: str) -> Iterator[dict]:
    ns = {"gml": NS_GML, "app": app_ns}
    for feat in root.iterfind(f".//app:{feature_tag}", ns):
        holder = feat.find(f".//app:{geom_tag}", ns)
        child = holder.find("./", ns)
        epsg = int(child.get("srsName").split(":")[-1])
        if child.tag == f"{{{NS_GML}}}Polygon":
            polys = [_patch_rings(child, ns, epsg)]
            geom_type = "Polygon"
        elif child.tag == f"{{{NS_GML}}}Surface":
            patches = child.findall("./gml:patches/gml:PolygonPatch", ns)
            polys = [_patch_rings(p, ns, epsg) for p in patches]
            geom_type = "Polygon" if len(patches) == 1 else "MultiPolygon"
        else:
            raise NotImplementedError(
                f"GML surface type {child.tag} not implemented "
                "(parity: municipality_split.py:540)"
            )
        name = feat.find(f".//app:{name_tag}", ns).text
        yield {
            "name": name,
            "geom_type": geom_type,
            "geometry": polys,
            "source_file": source,
        }


def parse_district_gml(
    files: DataFrame,
    *,
    app_ns: str,
    feature_tag: str,
    geom_tag: str,
    name_tag: str,
) -> DataFrame:
    """files(path, content) → (name, geom_type, geometry MultiPolygon-shaped,
    source_file). Parameterized on the product namespace/tags exactly like
    the reference's per-product assemblers (postcodes, electorates —
    municipality_split.py:543-580)."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for root in _xml_roots(path, bytes(content)):
                    rows.extend(
                        _parse_districts(root, name_tag, feature_tag, geom_tag, app_ns, path)
                    )
            if rows:
                yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(kernel, schema=DISTRICT_SCHEMA)


def read_binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Convenience: the distributed file scan the parsers consume."""
    return spark.read.format("binaryFile").load(path_glob)
