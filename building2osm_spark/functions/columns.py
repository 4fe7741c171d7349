"""Native Spark Column expressions (JVM-side, whole-stage-codegen friendly).

Everything here compiles to Catalyst expressions — no Python execution at
runtime. These are the engine's hot-path primitives: cell ids for spatial
join keys, equirectangular distance, bbox offsets, and the reference's
scalar string/tag functions (SURVEY.md §2.8 F1, F10, F13-F19).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import EARTH_RADIUS, EARTH_RADIUS_OFFSET

_RES_SHIFT = 54
_IX_SHIFT = 27


def map_update(base: Column, overrides: Column) -> Column:
    """dict.update() semantics for maps, independent of the session's
    spark.sql.mapKeyDedupPolicy: keys present in `overrides` replace the
    `base` entry instead of producing a duplicate key (which would throw
    under the default EXCEPTION policy — the driver's oracle session runs
    with defaults, so no operator may rely on LAST_WIN)."""
    keys = F.map_keys(overrides)
    return F.map_concat(
        F.map_filter(base, lambda k, _: ~F.array_contains(keys, k)), overrides
    )


def map_update_fixed(base: Column, overrides: Column, keys: tuple) -> Column:
    """map_update for override maps whose key set is a FIXED literal set
    (`keys` ⊇ the overrides' keys). Needed when the override values come
    from Python/Arrow UDFs: Catalyst rejects a map containing a UDF inside
    a higher-order-function lambda (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_
    WITH_PYTHON_UDF), so the base filter tests the literal key set instead
    of map_keys(overrides). Keys listed here are engine-owned (debug/diag
    tags) — a same-named key in base is dropped even when the override is
    absent, which is the intended fresh-per-run debug semantics."""
    return F.map_concat(F.map_filter(base, lambda k, _: ~k.isin(*keys)), overrides)


def cell_id_col(lon: Column, lat: Column, res: int) -> Column:
    """int64 cell id at resolution `res` — same scheme as cells.cell_id,
    expressed as pure Catalyst arithmetic so point-side cell assignment
    never leaves the JVM."""
    n = F.lit(1 << res).cast("long")
    ix = F.least(F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n), F.lit(0)), n - 1)
    iy = F.least(F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * n), F.lit(0)), n - 1)
    return (
        F.shiftleft(F.lit(res).cast("long"), _RES_SHIFT)
        .bitwiseOR(F.shiftleft(ix.cast("long"), _IX_SHIFT))
        .bitwiseOR(iy.cast("long"))
    )


def distance_m_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Equirectangular metre distance — native form of building2osm.py:105-110."""
    rlon1, rlat1 = F.radians(lon1), F.radians(lat1)
    rlon2, rlat2 = F.radians(lon2), F.radians(lat2)
    x = (rlon2 - rlon1) * F.cos((rlat1 + rlat2) * F.lit(0.5))
    y = rlat2 - rlat1
    return F.lit(EARTH_RADIUS) * F.sqrt(x * x + y * y)


def coordinate_offset_cols(lon: Column, lat: Column, dist_m: float) -> tuple[Column, Column]:
    """(lon, lat) shifted by dist_m metres — building_merge.py:211-218."""
    m = F.lit(dist_m / ((3.141592653589793 / 180.0) * EARTH_RADIUS_OFFSET))
    new_lat = lat + m
    new_lon = lon + m / F.cos(F.radians(lat))
    return new_lon, new_lat


def bearing_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Forward azimuth in degrees [0, 360) — native form of
    building2osm.py:160-167 (F5)."""
    rlon1, rlat1 = F.radians(lon1), F.radians(lat1)
    rlon2, rlat2 = F.radians(lon2), F.radians(lat2)
    dlon = rlon2 - rlon1
    y = F.sin(dlon) * F.cos(rlat2)
    x = F.cos(rlat1) * F.sin(rlat2) - F.sin(rlat1) * F.cos(rlat2) * F.cos(dlon)
    return F.pmod(F.degrees(F.atan2(y, x)) + F.lit(360.0), F.lit(360.0))


def polygon_area_col(ring: Column, radius: float = EARTH_RADIUS) -> Column:
    """Signed shoelace m² area truncated to long — native (sequential HOF
    fold, deterministic order) form of geom.polygon_area /
    building2osm.py:120-137. ring: array<array<double>> closed outer ring.
    Returns 0 for unclosed rings, like the reference."""
    lat_dist = F.lit(3.141592653589793 * radius / 180.0)

    def x_of(p):
        return p[0] * lat_dist * F.cos(F.radians(p[1]))

    def y_of(p):
        return p[1] * lat_dist

    n = F.size(ring)
    pairs = F.zip_with(
        F.slice(ring, 1, n - 1),
        F.slice(ring, 2, n - 1),
        lambda a, b: (x_of(b) - x_of(a)) * (y_of(b) + y_of(a)),
    )
    total = F.aggregate(pairs, F.lit(0.0), lambda acc, v: acc + v)
    closed = (F.element_at(ring, 1)[0] == F.element_at(ring, -1)[0]) & (
        F.element_at(ring, 1)[1] == F.element_at(ring, -1)[1]
    )
    return F.when((n > 0) & closed, (total / F.lit(2.0)).cast("long")).otherwise(
        F.lit(0).cast("long")
    )


def _seg_distance(p: Column, a: Column, b: Column) -> Column:
    """Metre distance from point p to segment (a, b) — native form of the
    reference's line_distance (building_merge.py:78-114): cos-latitude
    planar projection, clamped parametric projection, equirect metres."""
    x3 = F.radians(p[0]) * F.cos(F.radians(p[1]))
    y3 = F.radians(p[1])
    x1 = F.radians(a[0]) * F.cos(F.radians(a[1]))
    y1 = F.radians(a[1])
    x2 = F.radians(b[0]) * F.cos(F.radians(b[1]))
    y2 = F.radians(b[1])
    dx = x2 - x1
    dy = y2 - y1
    len_sq = dx * dx + dy * dy
    dot = (x3 - x1) * dx + (y3 - y1) * dy
    param = F.when(len_sq != 0.0, dot / len_sq).otherwise(F.lit(-1.0))
    t = F.least(F.greatest(param, F.lit(0.0)), F.lit(1.0))
    x4 = x1 + t * dx
    y4 = y1 + t * dy
    ddx = x4 - x3
    ddy = y4 - y3
    return F.lit(EARTH_RADIUS) * F.sqrt(ddx * ddx + ddy * ddy)


def hausdorff_col(ring_a: Column, ring_b: Column) -> Column:
    """Symmetric Hausdorff between two closed rings, vertex→segment metric
    — native form of geom.hausdorff_distance / building_merge.py:226-274
    (the reference's early-break is a CPU shortcut with identical value).

    Use when a plan must stay Python-free (or for SQL-verifiable results:
    the hausdorff_pairs driver oracle recomputes this in DuckDB). For
    throughput, prefer udfs.hausdorff_udf — measured 2× faster at 100k
    city pairs: the nested transform/zip_with allocations per element
    lose to one vectorized numpy matrix kernel per Arrow batch (operators/
    conflate.py kernel-choice note)."""

    def directed(verts_ring: Column, seg_ring: Column) -> Column:
        n = F.size(seg_ring)
        segs = F.zip_with(
            F.slice(seg_ring, 1, n - 1),
            F.slice(seg_ring, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        verts = F.slice(verts_ring, 1, F.size(verts_ring) - 1)
        return F.array_max(
            F.transform(
                verts,
                lambda v: F.array_min(
                    F.transform(segs, lambda s: _seg_distance(v, s["a"], s["b"]))
                ),
            )
        )

    ok = (F.size(ring_a) > 1) & (F.size(ring_b) > 1)
    return F.when(
        ok, F.greatest(directed(ring_a, ring_b), directed(ring_b, ring_a))
    ).otherwise(F.lit(0.0))


def polygon_centre_cols(ring: Column) -> tuple[Column, Column]:
    """Vertex-average centre, closing duplicate excluded — native form of
    geom.polygon_centre / building2osm.py:143-154."""
    n = F.size(ring)
    closed = (
        (n > 1)
        & (F.element_at(ring, 1)[0] == F.element_at(ring, -1)[0])
        & (F.element_at(ring, 1)[1] == F.element_at(ring, -1)[1])
    )
    body = F.when(closed, F.slice(ring, 1, n - 1)).otherwise(ring)
    m = F.size(body).cast("double")
    lon = F.aggregate(body, F.lit(0.0), lambda acc, p: acc + p[0]) / m
    lat = F.aggregate(body, F.lit(0.0), lambda acc, p: acc + p[1]) / m
    return lon, lat


# --- reference scalar string functions -------------------------------------

def fix_url_col(col: Column) -> Column:
    """Norwegian transliteration + space→_ — building2osm.py:321-323."""
    return F.regexp_replace(
        F.translate(col, "ÆØÅæøå", "EOAeoa"), " ", "_"
    )


def format_decimal_col(col: Column, *, exact: bool = True) -> Column:
    """'%.1f' then strip trailing 0 and '.' — building2osm.py:92-98.
    NULL/0 → empty string, like the reference's falsy check.
    format_string (printf), NOT format_number — no thousands separators.

    Rounding parity: CPython's '%.1f' rounds the EXACT binary value of the
    double half-even; every JVM-native path (format_string, round, bround,
    cast-to-decimal) instead rounds the SHORTEST decimal repr HALF_UP
    (BigDecimal.valueOf). The two differ exactly when the input is the
    nearest double to a two-decimal midpoint: 0.15 → CPython '0.1'
    (0.1499999…) vs JVM '0.2'; exact ties 1.25 → CPython half-even '1.2'
    vs JVM '1.3' (measured: 7 divergences over 4 016 crafted+random
    values). exact=True (default) therefore routes through an Arrow
    pandas UDF running CPython's own '%.1f' — byte parity; this is a
    sink-side output formatter, not a hot-path kernel. exact=False keeps
    the all-native bround approximation for in-plan use where the
    midpoint-repr divergence is acceptable.
    """
    if exact:
        from .udfs import format_decimal_udf

        return format_decimal_udf(col.cast("double"))
    txt = F.format_string("%.1f", F.bround(col.cast("double"), 1))
    stripped = F.regexp_replace(F.regexp_replace(txt, r"0$", ""), r"\.$", "")
    return F.when(col.isNull() | (col.cast("double") == 0.0), F.lit("")).otherwise(stripped)


def parse_ref_col(col: Column) -> Column:
    """';'-multi-value ref → array of distinct non-empty ints —
    filter_buildings.py:8-9."""
    parts = F.split(col, ";")
    nonempty = F.filter(parts, lambda x: (x != "") & x.isNotNull())
    return F.array_distinct(F.transform(nonempty, lambda x: x.cast("long")))


def level_code_cols(col: Column) -> tuple[Column, Column]:
    """'H0203' → (type 'H', number 2) — building2osm.py:746-749.
    try_cast: under the session's ANSI mode a malformed/short code would
    abort the whole job on cast; the reference skips empty codes
    (building2osm.py:746 guard) and would itself crash on short ones —
    NULL here makes both vanish from the max() aggregation instead."""
    return F.substring(col, 1, 1), F.substring(col, 2, 2).try_cast("int")


def date_trunc10_col(col: Column) -> Column:
    """'YYYY-MM-DD...' prefix slice — building2osm.py:651-653."""
    return F.substring(col, 1, 10)


def round7(col: Column) -> Column:
    """Output rounding to 7 decimals — building2osm.py:36,621,1226."""
    return F.round(col, 7)


def in_bbox_closed_col(lon: Column, lat: Column, bbox) -> Column:
    """Column twin of geom.in_bbox_closed (≤ on all four edges)."""
    return (
        (lon >= bbox[0]) & (lon <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3])
    )


def in_bbox_strict_col(lon: Column, lat: Column, bbox) -> Column:
    """Column twin of geom.in_bbox_strict (< on all four edges —
    building_merge.py's candidate prefilter convention)."""
    return (lon > bbox[0]) & (lon < bbox[2]) & (lat > bbox[1]) & (lat < bbox[3])


def in_bbox_half_open_col(lon: Column, lat: Column, bbox) -> Column:
    """Column twin of geom.in_bbox_half_open (≤ lower edges, < upper —
    the tiling convention: every point belongs to exactly one tile)."""
    return (lon >= bbox[0]) & (lon < bbox[2]) & (lat >= bbox[1]) & (lat < bbox[3])


def tagged_flag_col(tags: Column) -> Column:
    """True when any tag key is beyond building/source/addr:* —
    building_merge.py:444-448."""
    return F.exists(
        F.map_keys(tags),
        lambda k: (k != "building") & (k != "source") & ~k.contains("addr:"),
    )


def building_retag_cadastral_col(building: Column, area: Column) -> Column:
    """Size-based retag, cadastral pipeline (P4) — building2osm.py:539-554.
    Exact elif-chain order: garages > shed > farm_auxiliary > cabin."""
    return (
        F.when((building == "garage") & (area > 100), F.lit("garages"))
        .when(building.isin("garage", "barn") & (area < 15), F.lit("shed"))
        .when((building == "barn") & (area < 100), F.lit("farm_auxiliary"))
        .when((building == "hotel") & (area < 100), F.lit("cabin"))
        .otherwise(building)
    )


def building_retag_merge_col(building: Column, area: Column, type_tag: Column) -> Column:
    """Import-side retag fixes — building_merge.py:363-377. Sequential-if
    semantics: the TYPE-based rewrite applies first, then size rules on the
    (possibly rewritten) value; rules are mutually exclusive after that."""
    b1 = (
        F.when(type_tag.contains("#672 ") | type_tag.contains("#673 "), F.lit("religious"))
        .when(type_tag.contains("#199 "), F.lit("residential"))
        .otherwise(building)
    )
    return (
        F.when(b1 == "barracks", F.lit("container"))
        .when((b1 == "hotel") & (area < 100), F.lit("cabin"))
        .when(b1.isin("garage", "barn") & (area < 15), F.lit("shed"))
        .when((b1 == "barn") & (area < 100), F.lit("farm_auxiliary"))
        .otherwise(b1)
    )


def quadkey_col(tx: str, ty: str, z: str) -> Column:
    """Bing-style quadkey of tile column (tx, ty) at zoom column z — the
    string key whose PREFIX property makes multi-zoom tile tables
    range-scannable (a tile's quadkey is a prefix of all its
    descendants', so one sorted/partitioned layout serves every zoom
    level). Digit i (MSB first) = 2*bit(ty, z-i) + bit(tx, z-i); z=0 is
    the empty string. Args are COLUMN NAMES (the digits are a SQL
    lambda fold — pure Catalyst, no Python)."""
    digits = (
        f"aggregate(sequence(1, {z}), '', (acc, i) -> concat(acc, "
        f"CAST(((({ty}) >> (({z}) - i)) & 1) * 2 + ((({tx}) >> (({z}) - i)) & 1)"
        f" AS STRING)))"
    )
    # sequence(1, 0) yields a DESCENDING [1,0] (not an error); the z=0
    # guard must therefore select the empty string explicitly
    return F.when(F.col(z) > 0, F.expr(digits)).otherwise(F.lit(""))
