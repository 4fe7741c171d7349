"""Hierarchical int64 spatial cell index (H3/S2 stand-in, numpy-vectorized).

The sandbox has no h3/s2 library (SURVEY.md env facts), so the engine ships
its own deterministic cell scheme. It plays the role of the reference's
adaptive quadtree partitioner (building2osm.py:406-515): cells are the join
keys for point-in-polygon cover joins, kNN ring expansion, and skew-aware
repartitioning (hot-cell children explosion = the reference's force_divide
recursion at building2osm.py:496-515, expressed as data).

Scheme: equirectangular quadtree on (lon, lat). At resolution r (0..26) the
world is a 2^r × 2^r grid; a cell id packs (r << 54) | (ix << 27) | iy into
a positive int64. Parent/children are bit shifts, so `compact`/`uncompact`
and k-ring neighbours are O(1) integer ops — broadcast-join friendly.

Resolution ↔ size at the equator: 360°/2^r per cell; r=15 ≈ 0.011° ≈ 1.2 km,
r=18 ≈ 150 m, r=20 ≈ 38 m. For building-scale geometry at Norwegian
latitudes, r 15-18 gives 1-100 buildings per cell.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26
_IX_SHIFT = 27
_RES_SHIFT = 54
_COORD_MASK = (1 << 27) - 1


def cell_id(lon, lat, res: int) -> np.ndarray:
    """Vectorized (lon, lat) degrees → int64 cell at resolution res."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} outside [0, {MAX_RES}]")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.int64(1) << res
    ix = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return (np.int64(res) << _RES_SHIFT) | (ix << _IX_SHIFT) | iy


def cell_res(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> _RES_SHIFT).astype(np.int64)


def cell_ixy(cell) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    return (cell >> _IX_SHIFT) & _COORD_MASK, cell & _COORD_MASK


def cell_parent(cell, parent_res: int | None = None) -> np.ndarray:
    """Parent cell at parent_res (default: one level up)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    pres = (res - 1) if parent_res is None else np.full_like(res, parent_res)
    ix, iy = cell_ixy(cell)
    shift = res - pres
    return (pres << _RES_SHIFT) | ((ix >> shift) << _IX_SHIFT) | (iy >> shift)


def cell_children(cell) -> np.ndarray:
    """The 4 children of each cell: shape (..., 4)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell) + 1
    ix, iy = cell_ixy(cell)
    ix2, iy2 = ix << 1, iy << 1
    quads = []
    for dx in (0, 1):
        for dy in (0, 1):
            quads.append((res << _RES_SHIFT) | ((ix2 + dx) << _IX_SHIFT) | (iy2 + dy))
    return np.stack(quads, axis=-1)


def cell_bounds(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(minlon, minlat, maxlon, maxlat) of each cell."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    n = (np.int64(1) << res).astype(np.float64)
    ix, iy = cell_ixy(cell)
    w, h = 360.0 / n, 180.0 / n
    minlon = ix.astype(np.float64) * w - 180.0
    minlat = iy.astype(np.float64) * h - 90.0
    return minlon, minlat, minlon + w, minlat + h


def cell_center(cell) -> tuple[np.ndarray, np.ndarray]:
    minlon, minlat, maxlon, maxlat = cell_bounds(cell)
    return 0.5 * (minlon + maxlon), 0.5 * (minlat + maxlat)


def k_ring(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of one cell (the (2k+1)² block,
    clipped at grid edges). Drives kNN ring expansion (SURVEY.md J12)."""
    cell = np.int64(cell)
    res = int(cell_res(cell))
    n = np.int64(1) << res
    ix, iy = cell_ixy(cell)
    xs = np.arange(max(0, int(ix) - k), min(int(n) - 1, int(ix) + k) + 1, dtype=np.int64)
    ys = np.arange(max(0, int(iy) - k), min(int(n) - 1, int(iy) + k) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return ((np.int64(res) << _RES_SHIFT) | (gx.ravel() << _IX_SHIFT) | gy.ravel())


def ring_shell(cell: int, k: int) -> np.ndarray:
    """Only the cells at exactly Chebyshev distance k (the expansion shell)."""
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    full = k_ring(cell, k)
    inner = set(k_ring(cell, k - 1).tolist())
    return np.asarray([c for c in full.tolist() if c not in inner], dtype=np.int64)


def cover_bbox(minlon: float, minlat: float, maxlon: float, maxlat: float, res: int) -> np.ndarray:
    """All cells at `res` whose rectangle intersects the bbox (conservative
    cover — a superset is correct for candidate generation; PIP refines)."""
    n = np.int64(1) << res
    ix0 = int(np.clip(np.floor((minlon + 180.0) / 360.0 * int(n)), 0, int(n) - 1))
    ix1 = int(np.clip(np.floor((maxlon + 180.0) / 360.0 * int(n)), 0, int(n) - 1))
    iy0 = int(np.clip(np.floor((minlat + 90.0) / 180.0 * int(n)), 0, int(n) - 1))
    iy1 = int(np.clip(np.floor((maxlat + 90.0) / 180.0 * int(n)), 0, int(n) - 1))
    xs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    ys = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return (np.int64(res) << _RES_SHIFT) | (gx.ravel() << _IX_SHIFT) | gy.ravel()


_OVERLAP_MAX_ELEMS = 8_000_000  # bound (cells × vertices) bool intermediates


def _any_edge_bbox_overlap(c_minlon, c_minlat, c_maxlon, c_maxlat, r: np.ndarray) -> np.ndarray:
    """(cells,) bool: does any edge's bbox of ring `r` overlap each cell?
    Chunked over edges so a 100k-vertex ring never builds a multi-GB
    (cells × edges) matrix."""
    vx, vy = r[:, 0], r[:, 1]
    ex0 = np.minimum(vx[:-1], vx[1:])
    ex1 = np.maximum(vx[:-1], vx[1:])
    ey0 = np.minimum(vy[:-1], vy[1:])
    ey1 = np.maximum(vy[:-1], vy[1:])
    n_cells, n_edges = len(c_minlon), len(ex0)
    out = np.zeros(n_cells, dtype=bool)
    step = max(1, _OVERLAP_MAX_ELEMS // max(n_cells, 1))
    for lo in range(0, n_edges, step):
        hi = min(lo + step, n_edges)
        out |= (
            (c_minlon[:, None] <= ex1[None, lo:hi]) & (ex0[None, lo:hi] <= c_maxlon[:, None])
            & (c_minlat[:, None] <= ey1[None, lo:hi]) & (ey0[None, lo:hi] <= c_maxlat[:, None])
        ).any(axis=1)
    return out


def _any_vertex_in_cell(c_minlon, c_minlat, c_maxlon, c_maxlat, r: np.ndarray) -> np.ndarray:
    """(cells,) bool: does any vertex of ring `r` fall inside each cell?
    Chunked like _any_edge_bbox_overlap."""
    vx, vy = r[:, 0], r[:, 1]
    n_cells, n_verts = len(c_minlon), len(vx)
    out = np.zeros(n_cells, dtype=bool)
    step = max(1, _OVERLAP_MAX_ELEMS // max(n_cells, 1))
    for lo in range(0, n_verts, step):
        hi = min(lo + step, n_verts)
        out |= (
            (c_minlon[:, None] <= vx[None, lo:hi]) & (vx[None, lo:hi] <= c_maxlon[:, None])
            & (c_minlat[:, None] <= vy[None, lo:hi]) & (vy[None, lo:hi] <= c_maxlat[:, None])
        ).any(axis=1)
    return out


def cover_polygon(rings: list[np.ndarray], res: int, max_cells: int = 4096) -> np.ndarray:
    """Cell cover of a polygon (list of rings, ring 0 outer): bbox cells whose
    rectangle plausibly intersects the outer ring. Cells fully outside the
    outer ring (all 4 corners outside AND no vertex inside the cell) are
    pruned; remaining cells are a conservative cover.

    If the bbox cover at `res` would exceed max_cells, the resolution is
    lowered — covers stay bounded regardless of polygon size (a county
    boundary doesn't explode into millions of cells).
    """
    from .geom import points_in_ring  # local import to avoid cycle

    outer = np.asarray(rings[0], dtype=np.float64)
    minlon, minlat, maxlon, maxlat = (
        outer[:, 0].min(), outer[:, 1].min(), outer[:, 0].max(), outer[:, 1].max(),
    )
    use_res = res
    while use_res > 0:
        n = 1 << use_res
        ncells = (
            (int((maxlon + 180.0) / 360.0 * n) - int((minlon + 180.0) / 360.0 * n) + 1)
            * (int((maxlat + 90.0) / 180.0 * n) - int((minlat + 90.0) / 180.0 * n) + 1)
        )
        if ncells <= max_cells:
            break
        use_res -= 1
    cells = cover_bbox(float(minlon), float(minlat), float(maxlon), float(maxlat), use_res)
    if len(cells) <= 4:
        return cells

    # prune cells clearly outside: no corner inside outer ring, no outer
    # vertex inside cell, and cell does not straddle any edge bbox
    c_minlon, c_minlat, c_maxlon, c_maxlat = cell_bounds(cells)
    corners = np.stack(
        [
            np.stack([c_minlon, c_minlat], axis=1),
            np.stack([c_minlon, c_maxlat], axis=1),
            np.stack([c_maxlon, c_minlat], axis=1),
            np.stack([c_maxlon, c_maxlat], axis=1),
        ],
        axis=1,
    )  # (C, 4, 2)
    flat = corners.reshape(-1, 2)
    corner_inside = points_in_ring(flat, outer).reshape(-1, 4).any(axis=1)

    # vertex-in-cell test (any polygon vertex falls into the cell)
    vert_in = _any_vertex_in_cell(c_minlon, c_minlat, c_maxlon, c_maxlat, outer)
    # edge-bbox overlap: an edge may cross a cell without endpoints inside
    edge_overlap = _any_edge_bbox_overlap(c_minlon, c_minlat, c_maxlon, c_maxlat, outer)

    keep = corner_inside | vert_in | edge_overlap
    return cells[keep]


def cover_polygon_flags(
    rings: list[np.ndarray], res: int, max_cells: int = 4096
) -> tuple[np.ndarray, np.ndarray]:
    """(cells, full) cover where full[i] marks cells PROVABLY fully inside
    the polygon (all 4 corners inside the outer ring, no outer/hole edge
    bbox overlapping the cell, and not inside any hole). Points landing in
    a full cell need no exact PIP — at building/district scale the
    interior dominates, so this removes the ray cast for most points
    (the polyfill interior/boundary split)."""
    from .geom import points_in_ring

    cells = cover_polygon(rings, res, max_cells=max_cells)
    if len(cells) == 0:
        return cells, np.zeros(0, dtype=bool)
    # sub-cell early exit (round 6): a full cell's 4 corners lie strictly
    # inside the outer ring, so the ring's bbox must span at least one
    # full cell in BOTH axes — a polygon smaller than a cell (the common
    # case for building footprints at fine res) can have no full cell,
    # and the corner ray casts + edge-overlap scans below are pure
    # overhead. Strict <, so exactly-cell-sized polygons still take the
    # full path.
    r0 = np.asarray(rings[0], dtype=np.float64)
    n = 1 << res
    if (r0[:, 0].max() - r0[:, 0].min()) < 360.0 / n or (
        r0[:, 1].max() - r0[:, 1].min()
    ) < 180.0 / n:
        return cells, np.zeros(len(cells), dtype=bool)
    c_minlon, c_minlat, c_maxlon, c_maxlat = cell_bounds(cells)
    corners = np.stack(
        [
            np.stack([c_minlon, c_minlat], axis=1),
            np.stack([c_minlon, c_maxlat], axis=1),
            np.stack([c_maxlon, c_minlat], axis=1),
            np.stack([c_maxlon, c_maxlat], axis=1),
        ],
        axis=1,
    ).reshape(-1, 2)

    full = points_in_ring(corners, np.asarray(rings[0], dtype=np.float64)).reshape(-1, 4).all(axis=1)

    for ring in rings:  # outer + holes: any edge near the cell → boundary
        r = np.asarray(ring, dtype=np.float64)
        full &= ~_any_edge_bbox_overlap(c_minlon, c_minlat, c_maxlon, c_maxlat, r)
    for hole in rings[1:]:  # a full cell must not sit inside a hole
        h = np.asarray(hole, dtype=np.float64)
        inside_hole = points_in_ring(corners, h).reshape(-1, 4).any(axis=1)
        full &= ~inside_hole
    return cells, full


def compact(cells: np.ndarray) -> np.ndarray:
    """Merge every complete sibling quartet into its parent, repeatedly —
    the 'compacted cell cover' of the north star. Input: unique cells at a
    single resolution; output: mixed-resolution minimal cover."""
    out: list[np.ndarray] = []
    current = np.unique(np.asarray(cells, dtype=np.int64))
    while len(current) and int(cell_res(current[:1])[0]) > 0:
        parents = cell_parent(current)
        uniq, counts = np.unique(parents, return_counts=True)
        full = set(uniq[counts == 4].tolist())
        promote = np.isin(parents, list(full)) if full else np.zeros(len(current), dtype=bool)
        out.append(current[~promote])
        current = uniq[counts == 4]
        if not len(current):
            break
    if len(current):
        out.append(current)
    return np.concatenate(out) if out else np.asarray([], dtype=np.int64)


def uncompact(cells: np.ndarray, res: int) -> np.ndarray:
    """Expand a mixed-resolution cover to uniform resolution `res`."""
    cells = np.asarray(cells, dtype=np.int64)
    pieces = []
    for c in cells:
        r = int(cell_res(np.asarray([c]))[0])
        cur = np.asarray([c], dtype=np.int64)
        while r < res:
            cur = cell_children(cur).ravel()
            r += 1
        pieces.append(cur)
    return np.concatenate(pieces) if pieces else cells


def compact_flags(
    cell_full: dict[int, bool], levels: int = 6
) -> dict[int, bool]:
    """Compact a {cell: full} cover (cells at one resolution, `full` marking
    provably-interior cells): any complete sibling quartet merges into its
    parent, `levels` times. The parent is full iff all 4 children are full
    (their union tiles the parent exactly); a mixed quartet merges as a
    boundary parent — correct, because every boundary cell of a polygon
    carries the SAME ring set, so the downstream ray cast is unchanged —
    the merged-away full children merely lose the short-circuit.

    Coverage is exact: compaction only replaces complete quartets by their
    union, so uncompacting the result reproduces the input cell set.

    A mixed-resolution input holding BOTH an ancestor and its complete
    child quartet (outside the documented single-res input, but reachable
    through merged multi-feature covers) merges the promoted flag into the
    pre-existing parent with AND — boundary always wins, which is the safe
    direction since the ray cast is exact and `full` only short-circuits
    it.
    """
    cur = dict(cell_full)
    for _ in range(levels):
        if not cur:
            break
        cells_arr = np.fromiter(cur.keys(), dtype=np.int64, count=len(cur))
        cells_arr = cells_arr[cell_res(cells_arr) > 0]  # res 0 cannot merge
        if not len(cells_arr):
            break
        parents = cell_parent(cells_arr)
        groups: dict[int, list[int]] = {}
        for c, p in zip(cells_arr.tolist(), parents.tolist()):
            groups.setdefault(p, []).append(c)
        merged = False
        for p, kids in groups.items():
            if len(kids) == 4:
                full = all(cur[k] for k in kids)
                for k in kids:
                    del cur[k]
                # a PRE-EXISTING parent entry (mixed-res input holding both
                # an ancestor and its complete quartet) merges with AND:
                # the flags can disagree only on an inconsistent cover, and
                # False (boundary) is the always-safe direction — the ray
                # cast stays exact, full merely short-circuits it. A plain
                # overwrite could flip a boundary parent to full and skip
                # the cast for points outside the polygon.
                cur[p] = full if p not in cur else (full and cur[p])
                merged = True
        if not merged:
            break
    return cur


def dedup_ancestor_overlap(cell_full: dict[int, bool]) -> dict[int, bool]:
    """Drop any cell whose ancestor is also in the cover (the ancestor
    spatially contains it, so the fine cell's candidate row would be a
    duplicate). Mixed-resolution covers arise when a multipolygon feature's
    sub-polygon covers come out at different effective resolutions
    (cover_polygon's max_cells res-lowering); same-res covers pass through
    untouched. Keeping the ancestor is exact: a boundary ancestor carries
    the feature's full ring set, so the ray cast over the dropped cell's
    region is unchanged (only the dropped cell's interior short-circuit is
    lost)."""
    if not cell_full:
        return cell_full
    res_present = sorted({int(c) >> _RES_SHIFT for c in cell_full})
    if len(res_present) == 1:
        return cell_full
    min_res = res_present[0]
    out: dict[int, bool] = {}
    for c, f in cell_full.items():
        r = int(c) >> _RES_SHIFT
        ix = (int(c) >> _IX_SHIFT) & _COORD_MASK
        iy = int(c) & _COORD_MASK
        shadowed = False
        for pr in range(r - 1, min_res - 1, -1):
            shift = r - pr
            anc = (pr << _RES_SHIFT) | ((ix >> shift) << _IX_SHIFT) | (iy >> shift)
            if anc in cell_full:
                shadowed = True
                break
        if not shadowed:
            out[c] = f
    return out
