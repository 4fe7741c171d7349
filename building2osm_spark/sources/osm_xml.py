"""OSM XML sink (SURVEY.md S10) — single-document writer.

Reproduces building_merge.py:754-855's output shape: <osm> root with
nodes, then ways, then relations; tags as <tag k v/>; way node refs as
<nd ref/>; relation members as <member/>; version/user/timestamp attrs
passed through; action="modify"/"delete" attributes for the upload flow.

The output is inherently ONE document, so this is a driver-side writer
over collected DataFrames — the distributed part of the pipeline ends at
the DataFrames handed in (engine-internal persistence is Parquet/
snapshots). Deterministic: elements ordered by id ASCENDING within kind —
new negative ids first, then existing positive ids.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame


def _bounded_rows(df: DataFrame, kind: str, max_rows: int) -> list:
    # single-document sink ⇒ driver-side collect by design, but guard it:
    # beyond max_rows the driver would OOM silently — bound the collect
    # (CollectLimit short-circuits) and fail with an actionable message.
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_osm_xml collects to the driver for the single-document "
            f"output: {kind} exceeds max_rows={max_rows}. Filter to one "
            f"municipality (the reference emits per-municipality files), "
            f"write parquet instead, or pass a larger max_rows= if the "
            f"driver really has the memory."
        )
    return rows


def _set_common_attrs(el: ET.Element, row, keys=("version", "user", "uid", "timestamp", "changeset")):
    for k in keys:
        if k in row.__fields__ and row[k] is not None:
            el.set(k, str(row[k]))
    if "action" in row.__fields__ and row["action"] is not None:
        el.set("action", row["action"])


def _add_tags(el: ET.Element, tags) -> None:
    for k, v in sorted((tags or {}).items()):
        ET.SubElement(el, "tag", k=str(k), v=str(v))


def write_osm_xml(
    path: str,
    nodes: DataFrame,
    ways: DataFrame | None = None,
    relations: DataFrame | None = None,
    generator: str = "building2osm_spark",
    max_rows: int = 5_000_000,
) -> int:
    """Write an OSM change-style XML document; returns element count.

    nodes:     (id, lat, lon, tags map, [version user uid timestamp
               changeset action])
    ways:      (id, nodes array<bigint>, tags map, [attrs…])
    relations: (id, members array<struct<type,ref,role>>, tags map, [attrs…])
    """
    root = ET.Element("osm", version="0.6", generator=generator, upload="false")
    count = 0

    for row in sorted(_bounded_rows(nodes, "nodes", max_rows), key=lambda r: r["id"]):
        el = ET.SubElement(
            root, "node", id=str(row["id"]), lat=str(row["lat"]), lon=str(row["lon"])
        )
        _set_common_attrs(el, row)
        _add_tags(el, row["tags"] if "tags" in row.__fields__ else None)
        count += 1

    if ways is not None:
        for row in sorted(_bounded_rows(ways, "ways", max_rows), key=lambda r: r["id"]):
            el = ET.SubElement(root, "way", id=str(row["id"]))
            _set_common_attrs(el, row)
            for ref in row["nodes"]:
                ET.SubElement(el, "nd", ref=str(ref))
            _add_tags(el, row["tags"] if "tags" in row.__fields__ else None)
            count += 1

    if relations is not None:
        for row in sorted(_bounded_rows(relations, "relations", max_rows), key=lambda r: r["id"]):
            el = ET.SubElement(root, "relation", id=str(row["id"]))
            _set_common_attrs(el, row)
            for m in row["members"]:
                ET.SubElement(
                    el, "member", type=m["type"], ref=str(m["ref"]), role=m["role"] or ""
                )
            _add_tags(el, row["tags"] if "tags" in row.__fields__ else None)
            count += 1

    tree = ET.ElementTree(root)
    ET.indent(tree)
    tree.write(path, encoding="utf-8", xml_declaration=True)
    return count
