"""Exact group percentiles + histograms (operators/stats.py): brute-force
cross-check of the type-1 quantile semantics, integer rank arithmetic,
null handling, and the map-combinable plan shape."""

import math
import random

import pytest
from pyspark.sql import functions as F

from building2osm_spark.operators.stats import group_histogram, group_percentiles


def _type1(values, num, den):
    s = sorted(values)
    # ceil(n*q)-th smallest, 1-indexed — pure integer arithmetic
    return s[(len(s) * num + den - 1) // den - 1]


def test_percentiles_semantics(spark):
    rows = [
        ("a", 1), ("a", 2), ("a", 3), ("a", 4),   # even n: p50 = lower middle = 2
        ("b", 10), ("b", 10), ("b", 30),          # duplicates collapse, counts don't
        ("c", 5),                                  # singleton: all quantiles = 5
        ("d", None),                               # all-null group: absent
        ("a", None),                               # null inside a group: excluded
    ]
    df = spark.createDataFrame(rows, "lang string, v long")
    out = {r["lang"]: r for r in group_percentiles(df, "lang", "v", [0.5, 0.9, 1.0]).collect()}
    assert set(out) == {"a", "b", "c"}
    a = out["a"]
    assert (a["n"], a["p50"], a["p90"], a["p100"]) == (4, 2, 4, 4)
    b = out["b"]
    assert (b["n"], b["p50"], b["p90"], b["p100"]) == (3, 10, 30, 30)
    c = out["c"]
    assert (c["n"], c["p50"], c["p90"], c["p100"]) == (1, 5, 5, 5)


def test_percentiles_rational_and_errors(spark):
    df = spark.createDataFrame([("a", i) for i in range(1, 10)], "g string, v long")
    out = group_percentiles(df, "g", "v", [(1, 3), 0.25]).collect()[0]
    assert out["p_1_3"] == _type1(range(1, 10), 1, 3)
    assert out["p25"] == _type1(range(1, 10), 1, 4)
    with pytest.raises(ValueError, match="duplicate"):
        group_percentiles(df, "g", "v", [0.5, (1, 2)])
    with pytest.raises(ValueError, match="quantile"):
        group_percentiles(df, "g", "v", [0.0])


def test_percentiles_random_brute_force(spark):
    rng = random.Random(99)
    rows = [(f"g{rng.randrange(6)}", rng.randrange(100)) for _ in range(3000)]
    qs = [0.5, 0.9, 0.99, (2, 3)]
    out = {
        r["g"]: r
        for r in group_percentiles(
            spark.createDataFrame(rows, "g string, v long"), "g", "v", qs
        ).collect()
    }
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    for g, vals in groups.items():
        r = out[g]
        assert r["n"] == len(vals)
        for (num, den), name in [((1, 2), "p50"), ((9, 10), "p90"), ((99, 100), "p99"), ((2, 3), "p_2_3")]:
            assert r[name] == _type1(vals, num, den), (g, name)


def test_percentiles_plan_partial_agg(spark, final_plan):
    """The value shuffle must carry per-(group, value) partial counts,
    not raw rows: a partial_count HashAggregate below the exchange."""
    df = spark.range(10000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 7).alias("v")
    )
    out = group_percentiles(df, "g", "v", [0.5])
    final = final_plan(out)
    assert "partial_count" in final, final
    assert "Python" not in final


def test_stats_collision_raises(spark):
    df = spark.createDataFrame([("a", 1)], "n string, v long")
    with pytest.raises(ValueError, match="collide"):
        group_percentiles(df, "n", "v", [0.5])
    df2 = spark.createDataFrame([("a", 1)], "bucket_lo string, v long")
    with pytest.raises(ValueError, match="collide"):
        group_histogram(df2, "bucket_lo", "v", 5)


def test_histogram(spark):
    rows = [("a", 0), ("a", 4), ("a", 5), ("a", -3), ("a", None), ("b", 12)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {(r["g"], r["bucket_lo"]): r["n"] for r in group_histogram(df, "g", "v", 5).collect()}
    # floor semantics for negatives: -3 -> bucket [-5, 0)
    assert out == {("a", 0): 2, ("a", 5): 1, ("a", -5): 1, ("b", 10): 1}
    with pytest.raises(ValueError, match="bucket"):
        group_histogram(df, "g", "v", 0)
    big = 2**60
    df2 = spark.createDataFrame([("a", big + 7)], "g string, v long")
    got = group_histogram(df2, "g", "v", 4).collect()[0]
    assert got["bucket_lo"] == big + 4  # exact past 2^53
    assert math.isfinite(1.0)  # anchor math import
