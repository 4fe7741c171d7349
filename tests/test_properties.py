"""Property-based tests (hypothesis) — SURVEY.md §5.4 invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from building2osm_spark import cells, geom, utm

coord = st.tuples(
    st.floats(min_value=10.0, max_value=11.0, allow_nan=False),
    st.floats(min_value=59.0, max_value=60.5, allow_nan=False),
)


def ring_strategy(min_n=4, max_n=10):
    @st.composite
    def _ring(draw):
        n = draw(st.integers(min_n, max_n))
        cx = draw(st.floats(10.2, 10.8))
        cy = draw(st.floats(59.2, 60.2))
        angles = np.sort(
            np.asarray(draw(
                st.lists(st.floats(0, 2 * np.pi - 1e-6), min_size=n, max_size=n,
                         unique=True)
            ))
        )
        r = np.asarray(draw(
            st.lists(st.floats(5.0, 60.0), min_size=n, max_size=n)
        ))
        dlat = r / 111320.0
        dlon = r / (111320.0 * np.cos(np.radians(cy)))
        ring = np.stack([cx + dlon * np.cos(angles), cy + dlat * np.sin(angles)], axis=1)
        ring = np.round(ring, 7)
        return np.vstack([ring, ring[:1]])

    return _ring()


@settings(max_examples=60, deadline=None)
@given(ring_strategy(), st.lists(coord, min_size=1, max_size=20))
def test_pip_orientation_invariance(ring, pts):
    pts = np.asarray(pts)
    fwd = geom.points_in_ring(pts, ring)
    rev = geom.points_in_ring(pts, ring[::-1])
    assert np.array_equal(fwd, rev)


@settings(max_examples=40, deadline=None)
@given(ring_strategy(min_n=6, max_n=16), st.floats(0.05, 5.0))
def test_simplify_idempotent_and_bounded(ring, eps):
    once = geom.simplify_ring(ring, eps)
    twice = geom.simplify_ring(once, eps)
    assert np.array_equal(once, twice)
    assert len(once) >= 2
    # kept vertices are a subsequence of the original
    kept = {tuple(p) for p in once}
    assert kept <= {tuple(p) for p in ring}


@settings(max_examples=40, deadline=None)
@given(ring_strategy(), ring_strategy())
def test_hausdorff_symmetric_nonnegative(r1, r2):
    d12 = geom.hausdorff_distance(r1, r2)
    d21 = geom.hausdorff_distance(r2, r1)
    assert d12 >= 0
    assert abs(d12 - d21) < 1e-9


@settings(max_examples=60, deadline=None)
@given(coord)
def test_utm_roundtrip(p):
    lon, lat = p
    e, n = utm.latlon_to_utm(np.asarray([lat]), np.asarray([lon]), 33)
    lat2, lon2 = utm.utm_to_latlon(e, n, 33)
    assert abs(lat2[0] - lat) < 1e-9
    assert abs(lon2[0] - lon) < 1e-9


@settings(max_examples=60, deadline=None)
@given(coord, st.integers(4, 24))
def test_cell_contains_point(p, res):
    lon, lat = p
    c = cells.cell_id(np.asarray([lon]), np.asarray([lat]), res)
    minlon, minlat, maxlon, maxlat = cells.cell_bounds(c)
    assert minlon[0] <= lon <= maxlon[0] + 1e-12
    assert minlat[0] <= lat <= maxlat[0] + 1e-12
    # parent chain preserves containment
    if res > 4:
        parent = cells.cell_parent(c, parent_res=4)
        pm = cells.cell_bounds(parent)
        assert pm[0][0] <= lon <= pm[2][0] and pm[1][0] <= lat <= pm[3][0]


@settings(max_examples=30, deadline=None)
@given(ring_strategy(min_n=5, max_n=12))
def test_rectify_relocation_bound(ring):
    # building2osm.py:1230-1238 — a committed rectify never moves a node
    # ≥ rectify_margin (0.2 m)
    from building2osm_spark import geopasses as GP

    res = GP.rectify_group([[[tuple(p) for p in ring]]])
    if res.status == "done":
        assert res.relocated < 0.2


_tag_keys = st.text(
    alphabet="abcDEF_:", min_size=1, max_size=8
)
_tag_maps = st.dictionaries(
    _tag_keys, st.text(alphabet="xyz0 ", min_size=0, max_size=5), max_size=6
)


@settings(max_examples=5, deadline=None)
@given(pairs=st.lists(st.tuples(_tag_maps, _tag_maps), min_size=1, max_size=10))
def test_map_update_is_dict_update(spark, pairs):
    """functions.columns.map_update must equal CPython dict.update for
    arbitrary (possibly overlapping, possibly empty) string maps under
    the DEFAULT mapKeyDedupPolicy — the invariant every tag merge in the
    engine now rests on (no LAST_WIN session dependency)."""
    from pyspark.sql import functions as F

    from building2osm_spark.functions.columns import map_update

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i int, a map<string,string>, b map<string,string>",
    )
    got = {
        r["i"]: dict(r["m"])
        for r in df.select("i", map_update(F.col("a"), F.col("b")).alias("m")).collect()
    }
    assert got == {i: {**a, **b} for i, (a, b) in enumerate(pairs)}
