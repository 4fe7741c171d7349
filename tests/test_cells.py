"""Cell index unit tests: hierarchy, rings, covers, compaction."""

from __future__ import annotations

import numpy as np

from building2osm_spark import cells, geom

rng = np.random.default_rng(7)


def test_roundtrip_center():
    lon = rng.uniform(-179, 179, 1000)
    lat = rng.uniform(-89, 89, 1000)
    for res in (5, 15, 20, 26):
        c = cells.cell_id(lon, lat, res)
        clon, clat = cells.cell_center(c)
        w = 360.0 / (1 << res)
        assert np.all(np.abs(clon - lon) <= w)
        assert np.all(np.abs(clat - lat) <= w)


def test_parent_child_consistency():
    c = cells.cell_id(np.array([10.75]), np.array([59.91]), 18)
    kids = cells.cell_children(c)[0]
    assert len(kids) == 4
    assert len(set(kids.tolist())) == 4
    for kid in kids:
        assert cells.cell_parent(np.array([kid]))[0] == c[0]
    # parent at arbitrary resolution
    p10 = cells.cell_parent(c, parent_res=10)
    assert cells.cell_res(p10)[0] == 10
    # point stays inside its ancestors
    minlon, minlat, maxlon, maxlat = cells.cell_bounds(p10)
    assert minlon[0] <= 10.75 <= maxlon[0]
    assert minlat[0] <= 59.91 <= maxlat[0]


def test_k_ring_sizes():
    c = int(cells.cell_id(np.array([10.75]), np.array([59.91]), 15)[0])
    assert len(cells.k_ring(c, 0)) == 1
    assert len(cells.k_ring(c, 1)) == 9
    assert len(cells.k_ring(c, 2)) == 25
    assert len(cells.ring_shell(c, 1)) == 8
    assert len(cells.ring_shell(c, 2)) == 16
    assert cells.ring_shell(c, 0)[0] == c


def test_cover_bbox_contains_all_points():
    pts_lon = rng.uniform(10.70, 10.76, 500)
    pts_lat = rng.uniform(59.90, 59.95, 500)
    cover = set(cells.cover_bbox(10.70, 59.90, 10.76, 59.95, 15).tolist())
    pc = cells.cell_id(pts_lon, pts_lat, 15)
    assert set(pc.tolist()) <= cover


def test_cover_polygon_superset_of_member_points():
    # every point inside the polygon must land in a cover cell
    ring = np.array(
        [[10.70, 59.90], [10.76, 59.90], [10.76, 59.95], [10.73, 59.97],
         [10.70, 59.95], [10.70, 59.90]]
    )
    cover = set(cells.cover_polygon([ring], 15).tolist())
    pts = np.stack([rng.uniform(10.69, 10.77, 2000), rng.uniform(59.89, 59.98, 2000)], axis=1)
    inside = geom.points_in_ring(pts, ring)
    pc = cells.cell_id(pts[inside, 0], pts[inside, 1], 15)
    assert set(pc.tolist()) <= cover


def test_cover_polygon_prunes_far_cells():
    # L-shaped polygon: cover should be smaller than its bbox cover
    ring = np.array(
        [[10.0, 59.0], [10.5, 59.0], [10.5, 59.05], [10.05, 59.05],
         [10.05, 59.5], [10.0, 59.5], [10.0, 59.0]]
    )
    bbox_cover = cells.cover_bbox(10.0, 59.0, 10.5, 59.5, 12)
    poly_cover = cells.cover_polygon([ring], 12)
    assert len(poly_cover) < len(bbox_cover) * 0.6


def test_cover_polygon_res_degrade_bound():
    # a huge polygon must not explode: cover stays under max_cells
    ring = np.array(
        [[-30.0, -30.0], [30.0, -30.0], [30.0, 30.0], [-30.0, 30.0], [-30.0, -30.0]]
    )
    cover = cells.cover_polygon([ring], 20, max_cells=1000)
    assert len(cover) <= 1000


def test_cover_polygon_flags_interior_classification():
    ring = np.array(
        [[10.70, 59.90], [10.76, 59.90], [10.76, 59.95], [10.70, 59.95], [10.70, 59.90]]
    )
    hole = np.array(
        [[10.72, 59.92], [10.74, 59.92], [10.74, 59.93], [10.72, 59.93], [10.72, 59.92]]
    )
    cc, full = cells.cover_polygon_flags([ring, hole], 15)
    assert full.sum() > 0  # interior cells exist at this resolution
    assert (~full).sum() > 0
    # every corner of every 'full' cell is truly inside (and outside the hole)
    minlon, minlat, maxlon, maxlat = cells.cell_bounds(cc[full])
    corners = np.stack(
        [np.stack([minlon, minlat], 1), np.stack([maxlon, maxlat], 1),
         np.stack([minlon, maxlat], 1), np.stack([maxlon, minlat], 1)], axis=1
    ).reshape(-1, 2)
    assert geom.points_in_polygon(corners, [ring, hole]).all()


def test_compact_uncompact_roundtrip():
    base = cells.cell_id(np.array([10.75]), np.array([59.91]), 12)[0]
    full = cells.uncompact(np.array([base]), 15)  # 64 cells
    assert len(full) == 64
    comp = cells.compact(full)
    assert len(comp) == 1 and comp[0] == base
    # partial set stays partial
    partial = full[:-3]
    comp2 = cells.compact(partial)
    back = set(cells.uncompact(comp2, 15).tolist())
    assert back == set(partial.tolist())
