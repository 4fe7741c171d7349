"""As-of and interval joins (operators/asof.py): semantics against
hand-built expectations plus a randomized brute-force cross-check, and
the single-exchange plan contract for the union+window as-of form."""

import random

import pytest
from pyspark.sql import functions as F

from building2osm_spark.operators.asof import asof_join, interval_join


def _left(spark, rows):
    return spark.createDataFrame(rows, "lid long, k long, ts_us long, note string")


def _right(spark, rows):
    return spark.createDataFrame(rows, "k long, ts_us long, rid long, cents long")


def test_asof_backward_semantics(spark):
    left = _left(
        spark,
        [
            (1, 10, 100, "a"),   # rights at 50, 100 -> 100 (equal ts inclusive)
            (2, 10, 99, "b"),    # -> 50
            (3, 10, 10, "c"),    # before all rights -> null
            (4, 20, 500, "d"),   # key with no rights -> null
            (5, 10, None, "e"),  # null left ts -> null
        ],
    )
    right = _right(
        spark,
        [(10, 50, 7, 700), (10, 100, 8, 800), (10, 200, 9, 900), (10, None, 6, 600)],
    )
    out = asof_join(
        left, right, "k", ts_col="ts_us", payload=["rid", "cents"]
    )
    got = {r["lid"]: (r["matched_ts_us"], r["rid"], r["cents"], r["note"]) for r in out.collect()}
    assert got == {
        1: (100, 8, 800, "a"),
        2: (50, 7, 700, "b"),
        3: (None, None, None, "c"),
        4: (None, None, None, "d"),
        5: (None, None, None, "e"),
    }
    assert out.columns == ["lid", "k", "ts_us", "note", "matched_ts_us", "rid", "cents"]


def test_asof_tolerance_and_forward(spark):
    left = _left(spark, [(1, 10, 100, "a"), (2, 10, 400, "b"), (3, 10, None, "c")])
    right = _right(spark, [(10, 90, 7, 700), (10, 150, 8, 800)])
    back = asof_join(
        left, right, "k", ts_col="ts_us", payload=["rid"], tolerance_us=50
    )
    got = {r["lid"]: r["rid"] for r in back.collect()}
    assert got == {1: 7, 2: None, 3: None}  # 400-150=250 > 50 -> nulled

    fwd = asof_join(
        left, right, "k", ts_col="ts_us", payload=["rid"], direction="forward"
    )
    got = {r["lid"]: (r["matched_ts_us"], r["rid"]) for r in fwd.collect()}
    # 100 -> 150 (at-or-after); 400 -> none; null ts -> none (guard)
    assert got == {1: (150, 8), 2: (None, None), 3: (None, None)}

    fwd_tol = asof_join(
        left, right, "k", ts_col="ts_us", payload=["rid"],
        direction="forward", tolerance_us=10,
    )
    got = {r["lid"]: r["rid"] for r in fwd_tol.collect()}
    assert got == {1: None, 2: None, 3: None}  # 150-100=50 > 10


def test_asof_equal_ts_tiebreak(spark):
    left = _left(spark, [(1, 10, 100, "a")])
    right = _right(spark, [(10, 100, 3, 300), (10, 100, 9, 900), (10, 100, 5, 500)])
    out = asof_join(
        left, right, "k", ts_col="ts_us", payload=["rid", "cents"], tiebreak_col="rid"
    )
    row = out.collect()[0]
    assert (row["rid"], row["cents"]) == (9, 900)  # greatest tiebreak wins
    fwd = asof_join(
        left, right, "k", ts_col="ts_us", payload=["rid"],
        direction="forward", tiebreak_col="rid",
    )
    assert fwd.collect()[0]["rid"] == 9


def test_asof_collision_and_plan(spark, final_plan):
    left = _left(spark, [(1, 10, 100, "a")])
    right = _right(spark, [(10, 50, 7, 700)])
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right, "k", ts_col="ts_us", payload=["rid", "note"])
    with pytest.raises(ValueError, match="backward"):
        asof_join(left, right, "k", ts_col="ts_us", payload=["rid"], direction="nearest")
    with pytest.raises(ValueError, match="matched_ts_name"):
        asof_join(left, right, "k", ts_col="ts_us", payload=["rid"], matched_ts_name="rid")
    out = asof_join(left, right, "k", ts_col="ts_us", payload=["rid"])
    final = final_plan(out)
    assert final.count("Exchange") == 1, final
    assert "Python" not in final


def test_asof_random_brute_force(spark):
    rng = random.Random(42)
    lrows = [
        (i, rng.randrange(5), rng.randrange(1000), "x") for i in range(300)
    ]
    rrows = []
    seen = set()
    for i in range(200):
        k, t = rng.randrange(5), rng.randrange(1000)
        if (k, t) in seen:  # unique (key, ts): tiebreak-free ground truth
            continue
        seen.add((k, t))
        rrows.append((k, t, 1000 + i, i))
    out = asof_join(
        _left(spark, lrows), _right(spark, rrows), "k",
        ts_col="ts_us", payload=["rid"], tolerance_us=120,
    ).collect()
    rights = {}
    for k, t, rid, _ in rrows:
        rights.setdefault(k, []).append((t, rid))
    expect = {}
    for lid, k, t, _ in lrows:
        best = max(
            ((rt, rid) for rt, rid in rights.get(k, []) if rt <= t and t - rt <= 120),
            default=(None, None),
        )
        expect[lid] = best[1]
    assert {r["lid"]: r["rid"] for r in out} == expect


def test_interval_join_semantics(spark):
    pts = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 250), (3, 10, 9999), (4, 20, 100), (5, 10, None)],
        "pid long, k long, ts_us long",
    )
    ivals = spark.createDataFrame(
        [
            (7, 10, 100, 300),    # contains 100 (start edge) and 250
            (8, 10, 250, 250),    # degenerate: contains exactly 250
            (9, 10, 240, 260),    # crosses a bucket edge at 250 with bucket 50
            (11, 10, 300, 200),   # inverted -> matches nothing
            (12, 10, None, 400),  # null bound -> matches nothing
            (13, 30, 0, 10**3),   # key with no points
        ],
        "iid long, k long, start_us long, end_us long",
    )
    out = interval_join(
        pts, ivals, "k", ts_col="ts_us", start_col="start_us", end_col="end_us",
        bucket_us=50,
    )
    pairs = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert pairs == [(1, 7), (2, 7), (2, 8), (2, 9)]
    cols = set(out.columns)
    assert {"pid", "k", "ts_us", "iid", "start_us", "end_us"} <= cols


def test_interval_join_random_brute_force(spark):
    rng = random.Random(7)
    pts = [(i, rng.randrange(4), rng.randrange(2000)) for i in range(250)]
    ivals = []
    for i in range(120):
        s = rng.randrange(2000)
        ivals.append((i, rng.randrange(4), s, s + rng.randrange(300)))
    out = interval_join(
        spark.createDataFrame(pts, "pid long, k long, ts_us long"),
        spark.createDataFrame(ivals, "iid long, k long, start_us long, end_us long"),
        "k", ts_col="ts_us", start_col="start_us", end_col="end_us", bucket_us=128,
    ).collect()
    got = sorted((r["pid"], r["iid"]) for r in out)
    expect = sorted(
        (pid, iid)
        for pid, pk, t in pts
        for iid, ik, s, e in ivals
        if pk == ik and s <= t <= e
    )
    assert got == expect
    assert len(got) == len(set(got))  # exactly-once, no dedup needed


def test_interval_join_exact_past_2_53(spark):
    """Bucket index must be exact LONG arithmetic: at ts ~2^60 a double
    division is only precise to ~2^7, which mis-buckets small buckets
    and silently drops matches."""
    base = 2**60
    pts = spark.createDataFrame(
        [(1, 10, base + 3), (2, 10, base + 900)], "pid long, k long, ts_us long"
    )
    ivals = spark.createDataFrame(
        [(7, 10, base + 1, base + 5)], "iid long, k long, start_us long, end_us long"
    )
    out = interval_join(
        pts, ivals, "k", ts_col="ts_us",
        start_col="start_us", end_col="end_us", bucket_us=4,
    )
    assert sorted((r["pid"], r["iid"]) for r in out.collect()) == [(1, 7)]


def test_interval_join_max_buckets_guard(spark):
    """A single skewed interval at a misconfigured bucket_us must fail
    loudly instead of materializing a multi-million-element array."""
    pts = spark.createDataFrame([(1, 10, 100)], "pid long, k long, ts_us long")
    ivals = spark.createDataFrame(
        [(7, 10, 0, 10**9)], "iid long, k long, start_us long, end_us long"
    )
    out = interval_join(
        pts, ivals, "k", ts_col="ts_us", start_col="start_us",
        end_col="end_us", bucket_us=50,
    )
    with pytest.raises(Exception, match="covers more than 4096 buckets"):
        out.collect()


def test_interval_join_collision_raises(spark):
    pts = spark.createDataFrame([(1, 10, 100)], "pid long, k long, ts_us long")
    ivals = spark.createDataFrame(
        [(7, 10, 0, 200)], "pid long, k long, start_us long, end_us long"
    )
    with pytest.raises(ValueError, match="collide"):
        interval_join(
            pts, ivals, "k", ts_col="ts_us", start_col="start_us",
            end_col="end_us", bucket_us=50,
        )
