"""Ring-carry regime split (round 6): in the broadcast regime ring
payloads ride the candidate stream (no ring re-joins); in the shuffle
regime (autoBroadcastJoinThreshold<=0) rings re-join after the bbox
filter. Results must be identical either way."""

from __future__ import annotations

from pyspark.sql import functions as F

from building2osm_spark.operators import conflate as C
from building2osm_spark.sources import fixtures as FX


def _frames(spark, n=2_000):
    osm_pdf, import_pdf = FX.city_conflation_pdfs(n, urban_frac=0.2)
    osm = spark.createDataFrame(osm_pdf, schema=FX.OSM_CONFLATE_SCHEMA)
    imports = spark.createDataFrame(import_pdf, schema=FX.IMPORT_CONFLATE_SCHEMA)
    return osm, imports


def test_broadcast_regime_plan_has_no_ring_rejoins(spark):
    """Under the session's broadcast threshold the scored stage carries
    rings through the candidate stream: exactly TWO joins survive (the
    earlier-import anti-join + the candidate cell join) — the two ring
    re-joins of the split shape are gone from the plan."""
    import re

    osm, imports = _frames(spark)
    assert C._ring_carry_regime(
        osm.filter(F.col("ref_tag").isNull()).select(
            "osm_id", "c_lon", "c_lat", "area", "tagged", "ring"
        )
    )

    def n_joins(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return len(
            re.findall(
                r"\b(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
                r"|BroadcastNestedLoopJoin)\b",
                plan,
            )
        )

    n_carry = n_joins(C.conflate(osm, imports))
    real = C._ring_carry_regime
    try:
        C._ring_carry_regime = lambda s: False
        n_split = n_joins(C.conflate(osm, imports))
    finally:
        C._ring_carry_regime = real
    # split shape pays exactly two extra joins (o_rings + i_rings re-join)
    assert n_split == n_carry + 2, (n_carry, n_split)


def test_shuffle_regime_detection_off(spark):
    """autoBroadcastJoinThreshold=-1 (the documented at-scale regime,
    e.g. conflate_from_base) must disable ring carry so the candidate
    exchange stays ring-free (tests/test_bucketed.py asserts that plan)."""
    osm, _ = _frames(spark, 64)
    side = osm.select("osm_id", "c_lon", "c_lat", "area", "tagged", "ring")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert not C._ring_carry_regime(side)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_carry_and_split_results_identical(spark):
    """Full row-set equality between the two regimes on a city fixture —
    the carry is a plan restructure only."""
    osm, imports = _frames(spark)
    real = C._ring_carry_regime
    try:
        C._ring_carry_regime = lambda s: False
        split_rows = sorted(
            map(tuple, C.conflate(osm, imports, with_area_rejects=True).collect())
        )
        C._ring_carry_regime = lambda s: True
        carry_rows = sorted(
            map(tuple, C.conflate(osm, imports, with_area_rejects=True).collect())
        )
    finally:
        C._ring_carry_regime = real
    assert split_rows == carry_rows
    assert len(split_rows) > 0
