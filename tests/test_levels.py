"""Levels aggregation (A1/P8) over the dwellings fixture."""

from __future__ import annotations

from building2osm_spark.operators.levels import building_levels


def test_building_levels(spark):
    dwellings = spark.createDataFrame(
        [
            ("d1", "H0203"), ("d2", "H0301"), ("d3", "U0102"),   # b1: H=3,U=1 → 4
            ("d4", "H0101"),                                      # b2: H=1 → no tag
            ("d5", "L0201"), ("d6", "H0201"),                     # b3: L=2 roof, H=2 → 2
            ("d7", "K0101"),                                      # b4: K only → nothing
            ("d8", "L0301"), ("d9", "H0101"),                     # b5: L=3 but H+U=1
            ("d10", "L0201"), ("d11", "K0401"),                   # b6: L/K only, no H/U
        ],
        schema="bruksenhetId string, bruksenhetsnummerTekst string",
    )
    link = spark.createDataFrame(
        [("b1", "d1"), ("b1", "d2"), ("b1", "d3"), ("b2", "d4"),
         ("b3", "d5"), ("b3", "d6"), ("b4", "d7"),
         ("b5", "d8"), ("b5", "d9"), ("b6", "d10"), ("b6", "d11")],
        schema="ref string, bruksenhetId string",
    )
    rows = {r["ref"]: r for r in building_levels(dwellings, link).collect()}
    assert rows["b1"]["building_levels"] == 4 and rows["b1"]["roof_levels"] is None
    assert rows["b2"]["building_levels"] is None  # H+U = 1, not > 1
    assert rows["b3"]["building_levels"] == 2 and rows["b3"]["roof_levels"] == 2
    assert rows["b4"]["building_levels"] is None and rows["b4"]["roof_levels"] is None
    # roof:levels only inside the H+U > 1 branch (building2osm.py:757-762):
    # L>0 with H+U<=1 emits NO roof tag
    assert rows["b5"]["building_levels"] is None and rows["b5"]["roof_levels"] is None
    assert rows["b6"]["building_levels"] is None and rows["b6"]["roof_levels"] is None


def test_malformed_level_codes_ignored(spark):
    """Empty/NULL/short codes must not abort the job under ANSI mode —
    the reference skips falsy codes; short ones become NULL numbers and
    vanish from the max aggregation."""
    from building2osm_spark.operators.levels import building_levels

    dw = spark.createDataFrame(
        [("d1", "H0203"), ("d2", ""), ("d3", None), ("d4", "U01"), ("d5", "H")],
        "bruksenhetId string, bruksenhetsnummerTekst string",
    )
    link = spark.createDataFrame(
        [("b1", f"d{i}") for i in range(1, 6)], "ref string, bruksenhetId string"
    )
    rows = building_levels(dw, link).collect()
    assert len(rows) == 1
    assert rows[0]["building_levels"] == 3  # H2 + U1
    assert rows[0]["roof_levels"] is None
