"""OSM way → ring/polygon assembly (SURVEY.md J9).

Re-implements the reference's ring stitching (municipality_split.py:270-313
`connections`/`linear_rings_assembler`) and polygon assembly
(`polygon_assembler`, :316-351) as pure kernels, plus the Spark wiring:
relations/ways/nodes DataFrames → per-relation applyInPandas stitch (each
relation's data is tiny; parallelism comes from the number of relations).

Parity targets: tests/test_municipality_split.py:46-48 expects ring
[1,2,3,4,5,6,7,9,1]; :51-61 the Polygon assembly with real coords.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stitch_rings(relation_ways: list[dict]) -> list[list[int]]:
    """Order unordered (possibly reversed) ways into closed node-id rings.

    Mirrors municipality_split.py:282-313: start from the first way, walk
    shared end nodes (reversing a way when its tail matches), open a new
    ring when the current one closes; raises when a ring cannot close.
    """
    if not relation_ways:
        return []
    ways = [dict(w, nodes=list(w["nodes"])) for w in relation_ways]
    end_nodes: dict[int, set[int]] = {}
    for w in ways:
        for i in (0, -1):
            end_nodes.setdefault(w["nodes"][i], set()).add(w["id"])

    unused = {w["id"]: w for w in ways}
    current = ways[0]
    ring = [current["nodes"][0]]
    rings = [ring]
    for _ in range(len(ways)):
        ring.extend(current["nodes"][1:])
        last = ring[-1]
        del unused[current["id"]]
        if ring[0] != last:
            candidates = end_nodes[last] - {current["id"]}
            nxt = next(unused[w_id] for w_id in candidates if w_id in unused)
            if nxt["nodes"][0] == last:
                current = nxt
            elif nxt["nodes"][-1] == last:
                nxt["nodes"] = list(reversed(nxt["nodes"]))
                current = nxt
        elif unused:
            current = next(iter(unused.values()))
            ring = [current["nodes"][0]]
            rings.append(ring)
    if ring[0] != ring[-1]:
        raise ValueError("invalid polygon - ring not closed")
    return rings


def assemble_polygon(members: list[dict], ways: dict[int, dict], nodes: dict[int, dict]) -> dict:
    """Relation members → Polygon / MultiPolygon geometry dict.

    Mirrors municipality_split.py:316-351, EXTENDING the one case the
    reference refuses (`raise` at municipality_split.py:342): a
    multi-outer relation with inner ways. Each stitched inner ring is
    attached to the outer ring containing the most of its vertices
    (reference ray cast, geom.points_in_ring) — deterministic, robust to
    rings sharing boundary vertices; an inner contained by no outer is an
    assembly error (surfaced as the error column, not an exception).
    """
    outer, inner = [], []
    for m in members:
        if m["type"] != "way":
            continue
        way = ways[m["ref"]]
        role = m.get("role", "")
        if role in ("", "outer"):
            outer.append(way)
        elif role == "inner":
            inner.append(way)

    if not outer:
        # the reference fails loudly here (IndexError on relation_ways[0],
        # municipality_split.py:318): an inner-only or wayless relation
        # must not silently promote hole rings to outer rings
        raise ValueError("no outer way members")
    coords = [
        [(nodes[nid]["lon"], nodes[nid]["lat"]) for nid in ring]
        for ring in stitch_rings(outer)
    ]
    if len(coords) > 1:
        polys = [[ring] for ring in coords]
        if inner:
            import numpy as np

            from ..geom import points_in_ring

            for iring in stitch_rings(inner):
                ipts = np.asarray(
                    [(nodes[nid]["lon"], nodes[nid]["lat"]) for nid in iring],
                    dtype=np.float64,
                )
                votes = [
                    int(points_in_ring(ipts, np.asarray(poly[0], dtype=np.float64)).sum())
                    for poly in polys
                ]
                best = max(range(len(polys)), key=lambda j: votes[j])
                if votes[best] == 0:
                    raise ValueError("inner ring not inside any outer ring")
                polys[best].append([tuple(p) for p in ipts.tolist()])
        return {"type": "MultiPolygon", "coordinates": polys}
    if inner:
        coords.extend(
            [(nodes[nid]["lon"], nodes[nid]["lat"]) for nid in ring]
            for ring in stitch_rings(inner)
        )
    return {"type": "Polygon", "coordinates": coords}


ASSEMBLED_SCHEMA = T.StructType(
    [
        T.StructField("relation_id", T.LongType()),
        T.StructField("geom_type", T.StringType()),
        T.StructField(
            "geometry", T.ArrayType(T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))))
        ),  # MultiPolygon shape; Polygon wrapped as 1-element
        T.StructField("error", T.StringType()),
    ]
)


def assemble_relations(
    relations: DataFrame, ways: DataFrame, nodes: DataFrame
) -> DataFrame:
    """Distributed assembly: relations(id, members array<struct<type,ref,
    role>>), ways(id, nodes array<bigint>), osm nodes(id, lon, lat) →
    (relation_id, geom_type, geometry[MultiPolygon-shaped], error).

    Join shape: explode members → join ways (way rows) → explode way nodes
    → join node coords → regroup per relation → stitch kernel. All data
    movement is hash joins on ids; the per-relation kernel sees only its
    own ways/nodes.
    """
    member_ways = (
        relations.select(
            F.col("id").alias("relation_id"),
            F.posexplode("members").alias("member_pos", "m"),
        )
        .filter(F.col("m.type") == "way")
        .select(
            "relation_id",
            F.col("m.ref").alias("way_id"),
            F.col("m.role").alias("role"),
            "member_pos",
        )
    )
    # LEFT/outer joins: a member way absent from `ways` (or a way node
    # absent from `nodes`) must surface as an assembly error for that
    # relation — an inner join would silently drop the member and
    # assemble a valid-looking polygon missing a ring (the reference
    # fails loudly with a KeyError, municipality_split.py:323)
    with_nodes = member_ways.join(
        ways.select(F.col("id").alias("way_id"), F.col("nodes").alias("node_ids")),
        "way_id",
        "left",
    )
    node_coords = (
        with_nodes.select(
            "relation_id", "way_id", "role", "member_pos",
            F.posexplode_outer("node_ids").alias("pos", "node_id"),
        )
        .join(nodes.select(F.col("id").alias("node_id"), "lon", "lat"), "node_id", "left")
    )
    regrouped = node_coords.groupBy("relation_id", "way_id", "role", "member_pos").agg(
        F.sort_array(
            F.collect_list(F.struct("pos", "node_id", "lon", "lat"))
        ).alias("pts")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rid, grp in pdf.groupby("relation_id"):
            grp = grp.sort_values("member_pos")
            ways_d, members, nodes_d = {}, [], {}
            try:
                for _, row in grp.iterrows():
                    if any(p["node_id"] is None for p in row["pts"]):
                        raise ValueError(
                            f"member way {int(row['way_id'])} missing from ways input"
                        )
                    if any(p["lon"] is None or p["lon"] != p["lon"] for p in row["pts"]):
                        raise ValueError(
                            f"way {int(row['way_id'])} references nodes missing "
                            f"from nodes input"
                        )
                    node_ids = [int(p["node_id"]) for p in row["pts"]]
                    ways_d[int(row["way_id"])] = {"id": int(row["way_id"]), "nodes": node_ids}
                    members.append(
                        {"type": "way", "ref": int(row["way_id"]), "role": row["role"] or ""}
                    )
                    for p in row["pts"]:
                        nodes_d[int(p["node_id"])] = {"lon": p["lon"], "lat": p["lat"]}
                geom = assemble_polygon(members, ways_d, nodes_d)
                if geom["type"] == "Polygon":
                    coords = [[list(p) for p in ring] for ring in geom["coordinates"]]
                    out.append((rid, "Polygon", [coords], None))
                else:
                    out.append(
                        (
                            rid,
                            "MultiPolygon",
                            [
                                [[list(p) for p in ring] for ring in poly]
                                for poly in geom["coordinates"]
                            ],
                            None,
                        )
                    )
            except Exception as e:  # noqa: BLE001 — surface as data, don't kill the stage
                out.append((rid, None, None, str(e)))
        return pd.DataFrame(
            out, columns=["relation_id", "geom_type", "geometry", "error"]
        )

    return regrouped.groupBy("relation_id").applyInPandas(kernel, ASSEMBLED_SCHEMA)
