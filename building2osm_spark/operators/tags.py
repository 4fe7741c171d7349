"""Tag-map operations (SURVEY.md G3 tail, P3, P7, F19).

The conflation tag merge reproduces add_building (building_merge.py:
552-585): on a matched pair, the OSM way keeps its tags minus
building:type/source/source:date, the import properties overwrite on
conflict, and a suppressed-category conflict flag OSM_BUILDING records
the old building=* value when the two disagree across the
similar-building categories (building_merge.py:34-38,564-573).

All map surgery is native (map_filter/map_update/map_contains_key);
map_update gives dict.update semantics (import properties win, matching
building_merge.py:580) independent of the session's mapKeyDedupPolicy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import SIMILAR_BUILDINGS
from ..functions.columns import map_update

_DROPPED_KEYS = ("building:type", "source", "source:date")  # building_merge.py:575
# building_merge.py:576 INTENDS to also drop these under remove_addr, but a
# precedence quirk (`LIST or remove_addr and ...` — the truthy list wins)
# means the reference never actually iterates them. Default behavior here
# mirrors the reference as-run (addr kept); remove_addr=True implements the
# documented intent.
_ADDR_KEYS = (
    "addr:street", "addr:housenumber", "addr:city", "addr:country", "addr:place",
)


def _in_category(value: Column, category: list[str]) -> Column:
    return value.isin(*category)


def merged_tags(
    osm_tags: Column, import_props: Column, remove_addr: bool = False
) -> Column:
    """New tag map for a matched building (add_building semantics)."""
    dropped = _DROPPED_KEYS + (_ADDR_KEYS if remove_addr else ())
    kept = F.map_filter(osm_tags, lambda k, _: ~k.isin(*dropped))

    osm_b = osm_tags["building"]
    imp_b = import_props["building"]
    same_category = F.lit(False)
    for cat in SIMILAR_BUILDINGS.values():
        same_category = same_category | (
            _in_category(osm_b, cat) & _in_category(imp_b, cat)
        )
    conflict = (
        osm_b.isNotNull()
        & (osm_b != "yes")
        & (osm_b != imp_b)
        & ~same_category
    )
    flagged = F.when(
        conflict,
        map_update(kept, F.create_map(F.lit("OSM_BUILDING"), osm_b)),
    ).otherwise(kept)
    return map_update(flagged, import_props)  # import wins


def tagged_flag(tags: Column) -> Column:
    """P7 — any tag beyond building/source/addr:* (building_merge.py:444-448)."""
    return F.exists(
        F.map_keys(tags),
        lambda k: (k != "building") & (k != "source") & ~k.contains("addr:"),
    )


_UPPERCASE_KEEP = ("TYPE", "STATUS", "DATE")  # building2osm.py:1309


def drop_debug_tags(
    tags: Column, keep_uppercase: bool = False, keep_verify: bool = False
) -> Column:
    """P3 — strip UPPERCASE debug/verify keys unless flagged, but keep the
    deliberate output properties TYPE/STATUS/DATE (building2osm.py:1306-1311;
    they are set at :638-653 and feed building_merge's TYPE retag rules).
    keep_verify keeps VERIFY_* keys (the -verify flag, building2osm.py:1309)."""
    if keep_uppercase:
        return tags
    keep = lambda k, _: (k != F.upper(k)) | k.isin(*_UPPERCASE_KEEP)  # noqa: E731
    if keep_verify:
        return F.map_filter(tags, lambda k, v: keep(k, v) | k.contains("VERIFY"))
    return F.map_filter(tags, keep)
