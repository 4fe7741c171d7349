"""GML ingest kernels (S3/S4/S8) over crafted fixture files.

The cadastral fixture reproduces the Matrikkelen-Bygningspunkt shape of
building2osm.py:565-683 (namespaces, element paths, UTM-33 point); the
WFS fixture the inspire-bu-core2d line shape of :406-463; the district
fixture the Surface/PolygonPatch shape of municipality_split.py:472-560.
"""

from __future__ import annotations

import io
import zipfile

import numpy as np
import pytest

from building2osm_spark.sources import gml as GML
from building2osm_spark import utm as UTM

from tests.conftest import import_reference


APP = GML.NS_APP_BUILDING
G32 = GML.NS_GML


def _cadastral_xml(buildings) -> str:
    members = []
    for b in buildings:
        sefrak = (
            f"<app:sefrakIdent><app:SefrakIdent>"
            f"<app:sefrakKommune>{b['sefrak'][0]}</app:sefrakKommune>"
            f"<app:registreringskretsnummer>{b['sefrak'][1]}</app:registreringskretsnummer>"
            f"<app:huslopenummer>{b['sefrak'][2]}</app:huslopenummer>"
            f"</app:SefrakIdent></app:sefrakIdent>"
            if b.get("sefrak")
            else ""
        )
        dwellings = "".join(
            f"<app:bruksenhet><app:Bruksenhet><app:bruksenhetId>{d}"
            f"</app:bruksenhetId></app:Bruksenhet></app:bruksenhet>"
            for d in b.get("dwellings", [])
        )
        members.append(f"""
  <gml:featureMember>
    <app:Bygning>
      <app:bygningsnummer>{b['ref']}</app:bygningsnummer>
      <app:representasjonspunkt><gml:Point>
        <gml:pos>{b['x']} {b['y']}</gml:pos>
      </gml:Point></app:representasjonspunkt>
      <app:bygningstype>{b['type']}</app:bygningstype>
      <app:bygningsstatus>{b['status']}</app:bygningsstatus>
      <app:oppdateringsdato>{b['date']}T00:00:00</app:oppdateringsdato>
      <app:harKulturminne>{str(b.get('heritage', False)).lower()}</app:harKulturminne>
      {sefrak}{dwellings}
    </app:Bygning>
  </gml:featureMember>""")
    return (
        f'<gml:FeatureCollection xmlns:gml="{G32}" xmlns:app="{APP}">'
        + "".join(members)
        + "</gml:FeatureCollection>"
    )


def test_cadastral_gml_zip_parse(spark, tmp_path):
    # UTM-33 coordinates derived by round-trip so the expected WGS84 is exact
    lat0, lon0 = 59.912345, 10.752345
    e, n = UTM.latlon_to_utm(np.array([lat0]), np.array([lon0]), 33)
    xml = _cadastral_xml(
        [
            {
                "ref": "100001", "x": float(e[0]), "y": float(n[0]),
                "type": "111", "status": "FA", "date": "2020-05-06",
                "heritage": True, "sefrak": ("1234", "0001", "2"),
                "dwellings": ["d1", "d2"],
            },
            {
                "ref": "100002", "x": float(e[0]) + 100, "y": float(n[0]) + 100,
                "type": "181", "status": "RA", "date": "2015-01-02",
            },
        ]
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("Basisdata_0301_Oslo_25833_MatrikkelenBygning_GML.gml", xml)
    zpath = tmp_path / "cadastre.zip"
    zpath.write_bytes(buf.getvalue())

    files = GML.read_binary_files(spark, str(zpath))
    out = GML.parse_cadastral_gml(files)
    rows = {r["ref"]: r for r in out.collect()}
    assert len(rows) == 2
    r1 = rows["100001"]
    # reference reprojects with utm.UtmToLatLon and rounds to 7 decimals
    ref_utm = import_reference("utm")
    want_lat, want_lon = ref_utm.UtmToLatLon(float(e[0]), float(n[0]), 33, "N")
    assert r1["lon"] == pytest.approx(round(want_lon, 7), abs=1e-7)
    assert r1["lat"] == pytest.approx(round(want_lat, 7), abs=1e-7)
    assert r1["building_type"] == "111" and r1["status"] == "FA"
    assert r1["date"] == "2020-05-06" and r1["heritage"] is True
    assert r1["sefrak"] == "1234-0001-2"
    assert r1["dwellings"] == ["d1", "d2"]
    assert rows["100002"]["heritage"] is False
    assert rows["100002"]["sefrak"] is None


def test_wfs_polygon_gml_parse(spark, tmp_path):
    # reference line-shape with a consecutive duplicate + an A,B,A backtrack
    # exercising parse_polygon dedupe (building2osm.py:296-315)
    text = """<wfs:FeatureCollection>
 <wfs:member>
  <bu-base:reference>200001</bu-base:reference>
  <gml:posList>10.0 59.0 10.0 59.0 10.1 59.0 10.0 59.0 10.1 59.0 10.1 59.1 10.0 59.0</gml:posList>
 </wfs:member>
 <wfs:member>
  <bu-base:reference>200002</bu-base:reference>
  <gml:posList>11.0 59.0 11.1 59.0 11.1 59.1 11.0 59.0</gml:posList>
  <gml:posList>11.02 59.02 11.05 59.02 11.05 59.05 11.02 59.02</gml:posList>
 </wfs:member>
</wfs:FeatureCollection>"""
    p = tmp_path / "wfs.gml"
    p.write_text(text)
    out = GML.parse_wfs_building_gml(GML.read_binary_files(spark, str(p)))
    rows = {r["ref"]: r for r in out.collect()}
    ref_b2o = import_reference("building2osm")
    want = ref_b2o.parse_polygon(
        "10.0 59.0 10.0 59.0 10.1 59.0 10.0 59.0 10.1 59.0 10.1 59.1 10.0 59.0"
    )
    got = [tuple(p) for p in rows["200001"]["geometry"][0]]
    assert got == [tuple(map(float, w)) for w in want]
    assert len(rows["200002"]["geometry"]) == 2  # outer + inner ring


def test_district_gml_surface_parse(spark, tmp_path):
    app = "http://skjema.geonorge.no/SOSI/produktspesifikasjon/Postnummeromrader/20180215"
    lat0, lon0 = 59.90, 10.70
    e, n = UTM.latlon_to_utm(np.array([lat0, lat0, 59.95, lat0]),
                             np.array([lon0, 10.80, 10.80, lon0]), 33)
    pos = " ".join(f"{x} {y}" for x, y in zip(e, n))
    xml = f"""<gml:FeatureCollection xmlns:gml="{G32}" xmlns:app="{app}">
 <gml:featureMember>
  <app:Postnummerområde>
   <app:postnummer>0150</app:postnummer>
   <app:område>
    <gml:Surface srsName="urn:ogc:def:crs:EPSG::25833">
     <gml:patches>
      <gml:PolygonPatch>
       <gml:exterior><gml:LinearRing><gml:posList>{pos}</gml:posList></gml:LinearRing></gml:exterior>
       <gml:interior><gml:LinearRing><gml:posList>{pos}</gml:posList></gml:LinearRing></gml:interior>
      </gml:PolygonPatch>
      <gml:PolygonPatch>
       <gml:exterior><gml:LinearRing><gml:posList>{pos}</gml:posList></gml:LinearRing></gml:exterior>
      </gml:PolygonPatch>
     </gml:patches>
    </gml:Surface>
   </app:område>
  </app:Postnummerområde>
 </gml:featureMember>
</gml:FeatureCollection>"""
    p = tmp_path / "districts.gml"
    p.write_text(xml)
    out = GML.parse_district_gml(
        GML.read_binary_files(spark, str(p)),
        app_ns=app, feature_tag="Postnummerområde",
        geom_tag="område", name_tag="postnummer",
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["name"] == "0150"
    assert r["geom_type"] == "MultiPolygon"  # two patches
    assert len(r["geometry"]) == 2
    assert len(r["geometry"][0]) == 2  # exterior + interior
    # UTM zone from srsName 25833 → WGS84 round-trips to the source points
    lon, lat = r["geometry"][0][0][0]
    assert lon == pytest.approx(lon0, abs=1e-7)
    assert lat == pytest.approx(lat0, abs=1e-7)


def test_zip_skips_non_xml_members(spark, tmp_path):
    """A user-rezipped archive with folder entries / .xsd noise must parse
    the GML members and ignore the rest instead of failing the task."""
    lat0, lon0 = 59.912345, 10.752345
    e, n = UTM.latlon_to_utm(np.array([lat0]), np.array([lon0]), 33)
    xml = _cadastral_xml(
        [{"ref": "99", "x": float(e[0]), "y": float(n[0]), "type": "181",
          "status": "RA", "date": "2021-01-01"}]
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data/", "")                       # directory entry
        zf.writestr("schema.xsd", "<xs:schema/>")      # non-feature XML-ish
        zf.writestr("__MACOSX/._junk", b"\x00\x01")    # binary noise
        zf.writestr("data/buildings.gml", xml)
    files = spark.createDataFrame(
        [("archive.zip", bytearray(buf.getvalue()))], "path string, content binary"
    )
    rows = GML.parse_cadastral_gml(files).collect()
    assert len(rows) == 1 and rows[0]["ref"] == "99"
