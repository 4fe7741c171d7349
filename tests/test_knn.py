"""kNN join vs brute-force numpy ground truth."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from building2osm_spark import geom
from building2osm_spark.operators.knn import knn_join
from building2osm_spark.sources import fixtures as FX


def brute_force_knn(points_pdf, targets_pdf, k):
    """{point_id: [(target_id, dist), ...]} by full pairwise distance."""
    p = points_pdf[["lon", "lat"]].to_numpy(np.float64)
    t = targets_pdf[["t_lon", "t_lat"]].to_numpy(np.float64)
    out = {}
    for i, pid in enumerate(points_pdf["point_id"]):
        d = geom.distance(np.broadcast_to(p[i], t.shape), t)
        order = np.lexsort((targets_pdf["target_id"].to_numpy(), d))
        out[pid] = [
            (targets_pdf["target_id"].iloc[j], float(d[j])) for j in order[:k]
        ]
    return out


def _fixture(spark, n_points=150, n_targets=120, seed=5):
    rng = np.random.default_rng(seed)
    minlon, minlat, maxlon, maxlat = FX.BBOX
    import pandas as pd

    points = pd.DataFrame(
        {
            "point_id": [f"p{i:04d}" for i in range(n_points)],
            "lon": rng.uniform(minlon, maxlon, n_points),
            "lat": rng.uniform(minlat, maxlat, n_points),
        }
    )
    # targets clustered: most in one corner, a few isolated (forces ring
    # escalation + the broadcast straggler pass)
    n_cluster = n_targets - 5
    targets = pd.DataFrame(
        {
            "target_id": [f"t{i:04d}" for i in range(n_targets)],
            "t_lon": np.concatenate(
                [rng.uniform(minlon, minlon + 0.05, n_cluster),
                 rng.uniform(maxlon - 0.01, maxlon, 5)]
            ),
            "t_lat": np.concatenate(
                [rng.uniform(minlat, minlat + 0.03, n_cluster),
                 rng.uniform(maxlat - 0.01, maxlat, 5)]
            ),
        }
    )
    return (
        spark.createDataFrame(points),
        spark.createDataFrame(targets),
        points,
        targets,
    )


def test_knn_k1_exact(spark):
    pts, tgts, points_pdf, targets_pdf = _fixture(spark)
    got = knn_join(pts, tgts, k=1).collect()
    want = brute_force_knn(points_pdf, targets_pdf, 1)
    assert len(got) == len(points_pdf)
    for r in got:
        wid, wdist = want[r.point_id][0]
        assert r.target_id == wid, f"{r.point_id}: {r.target_id} != {wid}"
        assert abs(r.dist_m - wdist) < 1e-6


def test_knn_k3_exact(spark):
    pts, tgts, points_pdf, targets_pdf = _fixture(spark, n_points=80, seed=9)
    got = knn_join(pts, tgts, k=3).collect()
    want = brute_force_knn(points_pdf, targets_pdf, 3)
    by_pid = {}
    for r in got:
        by_pid.setdefault(r.point_id, []).append((r.knn_rank, r.target_id, r.dist_m))
    assert len(by_pid) == len(points_pdf)
    for pid, rows in by_pid.items():
        rows.sort()
        assert [t for _, t, _ in rows] == [t for t, _ in want[pid]]


def test_knn_all_points_resolved_once(spark):
    pts, tgts, *_ = _fixture(spark, n_points=60, seed=13)
    got = knn_join(pts, tgts, k=2)
    counts = got.groupBy("point_id").count().collect()
    assert all(r["count"] == 2 for r in counts)
    assert len(counts) == 60


def test_knn_plan_is_native(spark):
    """No Python evaluation anywhere in the kNN plan."""
    pts, tgts, *_ = _fixture(spark, n_points=30)
    plan = knn_join(pts, tgts, k=1)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan


def test_knn_empty_targets_returns_empty(spark):
    """res=None over an empty target table must not crash on NULL bbox
    aggregates — it returns the schema-correct empty result."""
    pts, tgts, *_ = _fixture(spark, n_points=10)
    got = knn_join(pts, tgts.limit(0), k=1)
    assert got.count() == 0
    assert set(got.columns) == {"point_id", "lon", "lat", "target_id", "dist_m", "knn_rank"}


def test_knn_k_exceeds_targets_broadcasts_target_side(spark):
    """k > |targets|: no point ever resolves in the grid rounds (cnt < k),
    so the fallback must broadcast the TARGET side, not the full point
    table, and every point still gets all available targets."""
    pts, tgts, *_ = _fixture(spark, n_points=40, seed=5)
    three = tgts.orderBy("target_id").limit(3)
    want_ids = {r["target_id"] for r in three.collect()}
    got = knn_join(pts, three, k=5).collect()
    by_pid = {}
    for r in got:
        by_pid.setdefault(r.point_id, []).append(r.target_id)
    assert len(by_pid) == 40
    # each point gets all 3 available targets (k capped by availability)
    assert all(set(v) == want_ids for v in by_pid.values())


def test_knn_cross_shortcircuit_matches_pure_escalation(spark):
    """The round-6 straggler short-circuit (skip remaining grid rounds
    when remainder × targets is under the pair budget) must return
    exactly the pure-escalation result: same pairs, ranks, distances.
    cross_pairs_budget=0 disables the short-circuit (pre-round-6 grid
    escalation); the default fires it on this clustered fixture."""
    pts, tgts, points_pdf, targets_pdf = _fixture(spark, n_points=90, seed=21)
    want = brute_force_knn(points_pdf, targets_pdf, 2)

    def rows(df):
        return sorted(
            (r.point_id, r.knn_rank, r.target_id, round(r.dist_m, 9))
            for r in df.collect()
        )

    escalated = rows(knn_join(pts, tgts, k=2, cross_pairs_budget=0))
    shortcut = rows(knn_join(pts, tgts, k=2))
    assert escalated == shortcut
    got = {}
    for pid, rank, tid, _ in shortcut:
        got.setdefault(pid, []).append(tid)
    assert all(got[p] == [t for t, _ in want[p]] for p in got)
