"""All numeric constants of the reference pipeline, collected in one place.

Every value cites its origin in the reference repo (/root/reference). These
constants are semantic contracts: the engine must use the exact same values
to reproduce the reference's outputs (SURVEY.md §7.0).
"""

# --- rectify / simplify thresholds (building2osm.py:36-47) ---
COORDINATE_DECIMALS = 7     # building2osm.py:36 — output rounding
ANGLE_MARGIN = 8.0          # building2osm.py:38 — degrees around 90° corners
SHORT_MARGIN = 0.20         # building2osm.py:39 — metres; short wall removal
CORNER_MARGIN = 1.0         # building2osm.py:40 — metres; short-wall corner relaxation
RECTIFY_MARGIN = 0.2        # building2osm.py:41 — metres; max node relocation
SIMPLIFY_MARGIN = 0.05      # building2osm.py:43 — metres; RDP epsilon for curves
CURVE_MARGIN_MAX = 40       # building2osm.py:45 — degrees
CURVE_MARGIN_MIN = 0.3      # building2osm.py:46 — degrees
CURVE_MARGIN_NODES = 3      # building2osm.py:47 — min nodes in a curve
ADDR_MARGIN = 100           # building2osm.py:49 — metres (address match radius)
MAX_DOWNLOAD = 10000        # building2osm.py:51 — WFS page limit → partition target

# --- conflation thresholds (building_merge.py:27-29) ---
MARGIN_HAUSDORFF = 10.0     # building_merge.py:27 — metres, untagged buildings
MARGIN_TAGGED = 5.0         # building_merge.py:28 — metres, tagged buildings
MARGIN_AREA = 0.4           # building_merge.py:29 — min area ratio (and 1/0.4 max)
IDENTICAL_MARGIN = 1.0      # building_merge.py:706 — "identical building" Hausdorff

# --- earth radii: three distinct values, deliberately NOT unified ---
EARTH_RADIUS = 6371000.0          # building2osm.py:110,123,256 — distance/area/line_distance
EARTH_RADIUS_MERGE_AREA = 6371009.0  # building_merge.py:137 — merge-side polygon_area only
EARTH_RADIUS_OFFSET = 6378137.0   # building_merge.py:213 — coordinate_offset (WGS84 a)

# --- status codes (building2osm.py:54-65) ---
STATUS_CODES = {
    "RA": "Rammetillatelse",
    "IG": "Igangsettingstillatelse",
    "MB": "Midlertidig brukstillatelse",
    "FA": "Ferdigattest",
    "TB": "Bygning er tatt i bruk",
    "MT": "Meldingsak registrert",
    "MF": "Meldingsak fullført",
    "GR": "Bygning godkjent, revet eller brent",
    "IP": "Ikke pliktig registrert",
    "FS": "Fritatt for søknadsplikt",
}

# --- similar-building categories for tag-merge conflict suppression
# (building_merge.py:34-38) ---
SIMILAR_BUILDINGS = {
    "residential": ["house", "detached", "semidetached_house", "terrace", "farm",
                    "apartments", "residential", "cabin", "hut", "bungalow"],
    "commercial": ["retail", "commercial", "warehouse", "industrial", "office"],
    "farm": ["barn", "farm_auxiliary", "shed", "cabin"],
}

# --- engine-side defaults (not from the reference) ---
DEFAULT_CELL_RES = 15        # ~300 m cells at 60°N; tuned for building-scale joins
KNN_MAX_RINGS = 8            # kNN ring-expansion cap before falling back to global
HOT_CELL_FACTOR = 4          # children explosion when cell count > factor × target
