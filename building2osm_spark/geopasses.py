"""Pure-Python group kernels for the rectify + simplify geometry passes.

These are the engine's re-implementations of the reference's two big
mutation passes (SURVEY.md G1/G2), written as PURE functions over immutable
inputs so they can run inside `groupBy().applyInPandas` stages:

  * rectify_group:   building2osm.py:923-1270 (JOSM-style orthogonalization
                     of a connected group of buildings)
  * simplify_marks:  building2osm.py:775-865  (per-building redundant-node
                     identification: curve detection + RDP / straight-line
                     rules) — returns node decrement marks, NOT removals;
  * remove_marked:   building2osm.py:870-896  (physical removal given the
                     globally-resolved removable-node set).

The three-stage split is what makes the pass distributable: stage 1 and 3
are per-building (map), the census/removable resolution between them is a
groupBy on vertex — the reference's shared `nodes` dict and `remove_nodes`
set become DataFrames (see operators/geometry_passes.py).

Node identity is exact (lon, lat) float tuple equality, as in the
reference (coordinates are 7-decimal-rounded upstream). Groups are small
(clusters of touching buildings), so sequential Python inside a kernel is
fine — batching comes from Arrow at the applyInPandas boundary.

Known reference quirks preserved deliberately:
  * the simplify census counts the ring-closing duplicate vertex
    (building2osm.py:786-792 iterates the FULL ring), so a ring's start
    node can effectively never hit use-count 0 via the non-curve branch;
    the rectify census excludes it (building2osm.py:936);
  * rectify adds its dropped straight-line nodes to the global removal set
    BEFORE the relocation-distance abort check (building2osm.py:1097-1105
    vs :1238), so an aborted group still contributes removals;
  * `statistics.median_low` (not the mean) for the group bearing, with the
    180°-wraparound fix (building2osm.py:1144,1151-1156).
"""

from __future__ import annotations

import math
import statistics
from dataclasses import dataclass, field

from .constants import (
    ANGLE_MARGIN,
    CORNER_MARGIN,
    COORDINATE_DECIMALS,
    CURVE_MARGIN_MAX,
    CURVE_MARGIN_MIN,
    CURVE_MARGIN_NODES,
    RECTIFY_MARGIN,
    SHORT_MARGIN,
    SIMPLIFY_MARGIN,
)

Node = tuple[float, float]
Ring = list[Node]


# -- scalar geometry (kernel-internal; the vectorized forms live in geom.py,
#    these match the reference's evaluation order exactly for parity) -------

def _distance(p1: Node, p2: Node) -> float:
    lon1, lat1, lon2, lat2 = map(math.radians, (p1[0], p1[1], p2[0], p2[1]))
    x = (lon2 - lon1) * math.cos(0.5 * (lat2 + lat1))
    y = lat2 - lat1
    return 6371000.0 * math.sqrt(x * x + y * y)


def _bearing(p1: Node, p2: Node) -> float:
    lon1, lat1, lon2, lat2 = map(math.radians, (p1[0], p1[1], p2[0], p2[1]))
    dlon = lon2 - lon1
    y = math.sin(dlon) * math.cos(lat2)
    x = math.cos(lat1) * math.sin(lat2) - math.sin(lat1) * math.cos(lat2) * math.cos(dlon)
    return (math.degrees(math.atan2(y, x)) + 360.0) % 360.0


def _bearing_diff(b1: float, b2: float) -> float:
    delta = (b2 - b1 + 360.0) % 360.0
    return delta - 360.0 if delta > 180.0 else delta


def _turn(p1: Node, p2: Node, p3: Node) -> float:
    return _bearing_diff(_bearing(p1, p2), _bearing(p2, p3))


def _line_distance(s1: Node, s2: Node, p3: Node) -> float:
    x1, y1, x2, y2, x3, y3 = map(math.radians, (s1[0], s1[1], s2[0], s2[1], p3[0], p3[1]))
    x1 *= math.cos(y1)
    x2 *= math.cos(y2)
    x3 *= math.cos(y3)
    dx, dy = x2 - x1, y2 - y1
    len_sq = dx * dx + dy * dy
    param = ((x3 - x1) * dx + (y3 - y1) * dy) / len_sq if len_sq != 0 else -1.0
    if param < 0:
        x4, y4 = x1, y1
    elif param > 1:
        x4, y4 = x2, y2
    else:
        x4, y4 = x1 + param * dx, y1 + param * dy
    # sqrt(x*x + y*y), NOT math.hypot: the reference (building2osm.py:256)
    # uses the sqrt form and hypot differs by 1 ulp in ~16% of cases —
    # enough to flip RDP's `d > dmax` vertex choice
    x, y = x4 - x3, y4 - y3
    return 6371000.0 * math.sqrt(x * x + y * y)


def _rotate(axis: Node, angle_deg: float, p: Node) -> Node:
    r = math.radians(angle_deg)
    cos_axis = math.cos(math.radians(axis[1]))
    tr_x = (p[0] - axis[0]) * cos_axis
    tr_y = p[1] - axis[1]
    return (
        (tr_x * math.cos(r) - tr_y * math.sin(r)) / cos_axis + axis[0],
        (tr_x * math.sin(r) + tr_y * math.cos(r)) + axis[1],
    )


def _median_low(values: list[float]) -> float:
    s = sorted(values)
    return s[(len(s) - 1) // 2]


def _rdp(ring: Ring, eps: float) -> Ring:
    """building2osm.py:274-289, stack form (same vertex choices)."""
    keep = [False] * len(ring)
    keep[0] = keep[-1] = True
    stack = [(0, len(ring) - 1)]
    while stack:
        lo, hi = stack.pop()
        dmax, idx = 0.0, 0
        for i in range(lo + 1, hi):
            d = _line_distance(ring[lo], ring[hi], ring[i])
            if d > dmax:
                dmax, idx = d, i
        if dmax >= eps:
            keep[idx] = True
            stack.append((lo, idx))
            stack.append((idx, hi))
    return [p for p, k in zip(ring, keep) if k]


# ---------------------------------------------------------------------------
# rectify (G2)
# ---------------------------------------------------------------------------

@dataclass
class _Wall:
    nodes: list[Node] = field(default_factory=list)
    axis: int = 0
    bearing: float = 0.0


@dataclass
class _Corner:
    used: int = 0
    walls: list[_Wall] = field(default_factory=list)


@dataclass
class RectifyResult:
    status: str                       # 'done' | 'no'
    buildings: list[list[Ring]]       # new rings when 'done', originals when 'no'
    removed_nodes: set[Node]          # straight-line nodes dropped (even on abort)
    relocated: float = 0.0            # max node move in metres (when 'done')
    # abort reason in the reference's DEBUG_NORECTIFY wording
    # (building2osm.py:1007,1052,1072,1087,1264); '' when 'done'. The
    # reference tags the individual failing building — here the reason is
    # group-level (every member reports the group's last failing check).
    reason: str = ""


def _group_use_census(buildings: list[list[Ring]]) -> dict[Node, int]:
    """Per-group node use counts, closing duplicate EXCLUDED
    (building2osm.py:933-946 — counts polygon[:-1])."""
    use: dict[Node, int] = {}
    for rings in buildings:
        for ring in rings:
            for node in ring[:-1]:
                use[node] = use.get(node, 0) + 1
    return use


def bfs_group_order(buildings: list[list[Ring]]) -> list[int]:
    """Reproduce the reference's group traversal order
    (building2osm.py:949-984): neighbour lists are built in census order,
    then a FIFO walk from the first building expands them. The order feeds
    dict-insertion order downstream, which feeds float summation order —
    byte parity requires it."""
    node_parents: dict[Node, list[int]] = {}
    for bi, rings in enumerate(buildings):
        for ring in rings:
            for node in ring[:-1]:
                lst = node_parents.setdefault(node, [])
                if bi not in lst:
                    lst.append(bi)
    neighbours: list[list[int]] = [[bi] for bi in range(len(buildings))]
    for parents in node_parents.values():
        if len(parents) > 1:
            for p in parents:
                for q in parents:
                    if q not in neighbours[p]:
                        neighbours[p].append(q)
    order: list[int] = []
    check = list(neighbours[0])
    while check:
        for nb in neighbours[check[0]]:
            if nb not in order and nb not in check:
                check.append(nb)
        order.append(check[0])
        check.pop(0)
    return order


def rectify_group(buildings_in: list[list[Ring]]) -> RectifyResult:
    """Orthogonalize one connected group — building2osm.py:989-1266.

    Input: buildings as lists of closed rings (outer first), in GLOBAL
    insertion order (the kernel re-derives the reference's BFS order
    internally). Output geometry replaces all rings when the group commits.
    """
    order = bfs_group_order(buildings_in)
    buildings = [buildings_in[i] for i in order]
    use = _group_use_census(buildings_in)

    corners: dict[Node, _Corner] = {}
    walls_by_patch: list[list[_Wall]] = []
    conform = True
    reason = ""
    removed: set[Node] = set()

    def touch_corner(wall: _Wall | None, node: Node, used: int) -> None:
        corner = corners.setdefault(node, _Corner())
        if wall is not None:
            wall.nodes.append(node)
            corner.used += used
            corner.walls.append(wall)

    for rings in buildings:
        for ring in rings:
            if len(ring) < 5 or ring[0] != ring[-1]:
                conform = False
                reason = "No, only %i walls" % len(ring)  # building2osm.py:1007
                break

            patch_walls: list[_Wall] = []
            wall = _Wall()
            count_corners = 0
            last_corner = ring[-2]

            for i in range(len(ring) - 1):
                tc = _turn(last_corner, ring[i], ring[i + 1])
                short_len = min(_distance(last_corner, ring[i]), _distance(ring[i], ring[i + 1]))

                if (
                    _distance(ring[i], ring[i + 1]) < SHORT_MARGIN
                    and abs(tc + _turn(ring[i], ring[i + 1], ring[(i + 2) % (len(ring) - 1)]))
                    < ANGLE_MARGIN
                    and use[ring[i]] == 1
                ):
                    # short wall on a straight line: drop the node
                    touch_corner(None, ring[i], 0)
                elif (
                    90 - ANGLE_MARGIN < abs(tc) < 90 + ANGLE_MARGIN
                    or (short_len < CORNER_MARGIN and 60 < abs(tc) < 120 and use[ring[i]] == 1)
                ):
                    # square corner: close previous wall, open the next
                    touch_corner(wall, ring[i], 1)
                    patch_walls.append(wall)
                    wall = _Wall()
                    touch_corner(wall, ring[i], 1)
                    last_corner = ring[i]
                    count_corners += 1
                elif abs(tc) > ANGLE_MARGIN:
                    conform = False  # non-straight, non-square: give up (loop on)
                    reason = "No, %i degree angle" % tc  # building2osm.py:1052
                    last_corner = ring[i]
                elif use[ring[i]] > 1:
                    touch_corner(wall, ring[i], 0)  # shared node: keep, mid-wall
                    last_corner = ring[i]
                else:
                    touch_corner(None, ring[i], 0)  # straight-line node: drop

            if count_corners % 2 == 1:
                conform = False
                reason = "No, odd number %i" % count_corners  # building2osm.py:1072
            elif conform and not patch_walls:
                # zero square corners (fully degenerate ring, e.g. all
                # vertices identical): nothing to rectify. The reference
                # would crash at its own unguarded patch_walls[0]
                # (building2osm.py:1077) but can never receive such a ring —
                # its parse_polygon dedupe (:296-315, our P2) collapses it
                # below the 5-vertex check first. Treat as non-conform.
                conform = False
                reason = "No"
            elif conform:
                # wrap the trailing open wall onto the patch's first wall
                patch_walls[0].nodes = wall.nodes + patch_walls[0].nodes
                for node in wall.nodes:
                    cw = corners[node].walls
                    for j in range(len(cw) - 1, -1, -1):
                        if cw[j] is wall:
                            cw.pop(j)
                            break
                    if patch_walls[0] not in cw:
                        cw.append(patch_walls[0])
                walls_by_patch.append(patch_walls)

    if not conform:
        # building2osm.py:1086-1087 — plain 'No' when no specific reason set
        return RectifyResult("no", buildings_in, removed, reason=reason or "No")

    # remove unused nodes (this happens BEFORE the relocation abort check)
    for node in list(corners.keys()):
        if corners[node].used == 0:
            for patch in walls_by_patch:
                for w in patch:
                    if node in w.nodes:
                        w.nodes.remove(node)
            removed.add(node)
            del corners[node]

    # axis assignment + bearings (median-low per patch feeds the next patch)
    bearings: list[float] = []
    group_bearing = 90.0
    group_axis = 1
    for patch in walls_by_patch:
        start_axis = None
        for i, w in enumerate(patch):
            wb = _bearing(w.nodes[0], w.nodes[-1])
            if start_axis is None:
                diff = (wb - group_bearing + 180) % 180
                if diff > 90:
                    diff -= 180
                if abs(diff) < 45 and group_axis == 0:
                    start_axis = group_axis
                else:
                    start_axis = 1 - group_axis
                if not bearings:
                    group_axis = start_axis
            w.axis = (i + start_axis) % 2
            w.bearing = wb % 180 if w.axis == 0 else (wb + 90) % 180
            bearings.append(w.bearing)
        group_bearing = _median_low(bearings)

    # rotation centre: vertex mean over corner nodes in insertion order
    keys = list(corners.keys())
    length = len(keys) - 1 if keys[0] == keys[-1] else len(keys)
    axis_point = (
        sum(k[0] for k in keys[:length]) / length,
        sum(k[1] for k in keys[:length]) / length,
    )

    if max(bearings) - min(bearings) > 90:  # wraparound at 180
        bearings = [b + 180 if 0 <= b < 90 else b for b in bearings]
    avg_bearing = _median_low(bearings)

    # combine connected same-axis walls
    walls = [w for patch in walls_by_patch for w in patch]
    combined: list[list[_Wall]] = []
    for w in walls:
        if any(w in grp for grp in combined):
            continue
        same_axis: list[_Wall] = []
        check = [w]
        while check:
            if check[0].axis == w.axis:
                for node in check[0].nodes:
                    for cw in corners[node].walls:
                        if cw.axis == w.axis and cw not in check and cw not in same_axis:
                            check.append(cw)
                same_axis.append(check[0])
            check.pop(0)
        if len(same_axis) > 1:
            combined.append(same_axis)
    for grp in combined:
        main = grp[0]
        for w in grp[1:]:
            main.nodes.extend(list(set(w.nodes) - set(main.nodes)))

    # rotate, snap to wall means, rotate back, round
    new_node: dict[Node, Node] = {
        node: _rotate(axis_point, avg_bearing, node) for node in corners
    }
    for w in walls:
        xs = [new_node[n][0] for n in w.nodes]
        ys = [new_node[n][1] for n in w.nodes]
        # statistics.mean (exact Fraction-based), NOT sum/len: the
        # reference (building2osm.py:1212-1213) uses statistics.mean and
        # the two differ by 1 ulp for ~29% of coordinate lists — the
        # snapped wall coordinate feeds round(·, 7) and the relocation
        # abort, where an ulp flips output bytes
        mx = statistics.mean(xs)
        my = statistics.mean(ys)
        for n in w.nodes:
            if w.axis == 1:
                new_node[n] = (new_node[n][0], my)
            else:
                new_node[n] = (mx, new_node[n][1])
    for node in list(new_node.keys()):
        back = _rotate(axis_point, -avg_bearing, new_node[node])
        new_node[node] = (
            round(back[0], COORDINATE_DECIMALS),
            round(back[1], COORDINATE_DECIMALS),
        )

    # abort when any node moved too far
    relocated = 0.0
    for rings in buildings:
        for ring in rings:
            for node in ring:
                if node in new_node:
                    relocated = max(relocated, _distance(node, new_node[node]))
    if relocated >= RECTIFY_MARGIN:
        return RectifyResult(
            "no", buildings_in, removed,
            reason="Node relocated %.1f m" % relocated,  # building2osm.py:1264
        )

    out: list[list[Ring]] = []
    for rings in buildings_in:  # emit in input order, not BFS order
        new_rings: list[Ring] = []
        for ring in rings:
            nr = [new_node[node] for node in ring if node in new_node]
            if nr[0] != nr[-1]:
                nr.append(nr[0])
            new_rings.append(nr)
        out.append(new_rings)
    return RectifyResult("done", out, removed, relocated)


# ---------------------------------------------------------------------------
# simplify (G1)
# ---------------------------------------------------------------------------

def simplify_census(rings: list[Ring]) -> list[Node]:
    """Occurrences this building contributes to the global use census —
    INCLUDING the ring-closing duplicate (building2osm.py:786-792)."""
    return [node for ring in rings for node in ring]


def simplify_marks(rings: list[Ring]) -> list[Node]:
    """Redundant-node decrement marks for one non-rectified building
    (building2osm.py:802-865). Returns one entry per decrement (a node may
    be marked more than once across rings)."""
    marks: list[Node] = []
    for ring in rings:
        # curve detection
        curves: set[int] = set()
        curve: set[int] = set()
        last_b = 0.0
        for i in range(1, len(ring) - 1):
            nb = _turn(ring[i - 1], ring[i], ring[i + 1])
            if math.copysign(1, last_b) == math.copysign(1, nb) and (
                CURVE_MARGIN_MIN < abs(nb) < CURVE_MARGIN_MAX
            ):
                curve.update((i - 1, i, i + 1))
            else:
                if len(curve) > CURVE_MARGIN_NODES + 1:
                    curves |= curve
                curve = set()
            last_b = nb
        if len(curve) > CURVE_MARGIN_NODES + 1:
            curves |= curve

        if curves:
            # light RDP for curved buildings, with the start-node retest
            new_ring = _rdp(ring, SIMPLIFY_MARGIN)
            if _line_distance(new_ring[-2], new_ring[1], new_ring[0]) < SIMPLIFY_MARGIN:
                new_ring = new_ring[1:-1] + [new_ring[1]]
            if len(new_ring) < len(ring):
                for node in ring:
                    if node not in new_ring:
                        marks.append(node)
        else:
            last_node = ring[-2]
            for i in range(len(ring) - 1):
                angle = _turn(last_node, ring[i], ring[i + 1])
                length = _distance(ring[i], ring[i + 1])
                if (
                    abs(angle) < ANGLE_MARGIN
                    or (
                        length < SHORT_MARGIN
                        and (
                            abs(angle) < 40
                            or abs(
                                angle
                                + _turn(ring[i], ring[i + 1], ring[(i + 2) % (len(ring) - 1)])
                            )
                            < ANGLE_MARGIN
                        )
                    )
                    or (length < CORNER_MARGIN and abs(angle) < 2 * ANGLE_MARGIN)
                ):
                    marks.append(ring[i])
                else:
                    last_node = ring[i]
    return marks


def connected_groups(buildings: list[list[Ring]]) -> list[list[int]]:
    """Partition building indices into connected components by shared
    vertices (building2osm.py:929-957 neighbour construction, closing
    duplicate excluded). Groups are returned in first-member order, members
    in insertion order — matching the reference's iteration."""
    parent = list(range(len(buildings)))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    seen: dict[Node, int] = {}
    for bi, rings in enumerate(buildings):
        for ring in rings:
            for node in ring[:-1]:
                if node in seen:
                    union(seen[node], bi)
                else:
                    seen[node] = bi
    groups: dict[int, list[int]] = {}
    for bi in range(len(buildings)):
        groups.setdefault(find(bi), []).append(bi)
    return [groups[k] for k in sorted(groups)]


def apply_passes(buildings: list[list[Ring]]) -> tuple[list[list[Ring]], list[str]]:
    """Reference pipeline order (building2osm.py:1360-1361): rectify all
    groups, then simplify with a global census. Pure-python twin of the
    Spark plan in operators/geometry_passes.py — used for kernel parity
    tests and as the oracle for the distributed version.

    Returns (new geometries, per-building status 'done'|'no')."""
    n = len(buildings)
    geoms = [list(rings) for rings in buildings]
    status = ["no"] * n
    removed: set[Node] = set()

    for group in connected_groups(buildings):
        res = rectify_group([buildings[i] for i in group])
        removed |= res.removed_nodes
        for gi, bi in enumerate(group):
            status[bi] = res.status
            if res.status == "done":
                geoms[bi] = res.buildings[gi]

    census: dict[Node, int] = {}
    for rings in geoms:
        for node in simplify_census(rings):
            census[node] = census.get(node, 0) + 1
    for bi, rings in enumerate(geoms):
        if status[bi] != "done":
            for node in simplify_marks(rings):
                census[node] -= 1
    removable = {node for node, cnt in census.items() if cnt == 0} | removed

    out = []
    for rings in geoms:
        new_rings, _ = remove_marked(rings, removable)
        out.append(new_rings)
    return out, status


def remove_marked(rings: list[Ring], removable: set[Node]) -> tuple[list[Ring], int]:
    """Physically remove removable nodes — building2osm.py:881-892 semantics
    (first-occurrence pop; ring re-closed when the start node goes)."""
    count = 0
    out: list[Ring] = []
    for ring in rings:
        poly = list(ring)
        for node in poly[:-1]:
            if node in removable:
                i = poly.index(node)
                poly.pop(i)
                count += 1
                if i == 0:
                    poly[-1] = poly[0]
        out.append(poly)
    return out, count
