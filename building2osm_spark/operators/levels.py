"""Building-levels aggregation (SURVEY.md S5/J5/A1/P8).

Reproduces the dwellings flow of building2osm.py:711-768: apartment rows
carry a level code text like 'H0203' (char 0 ∈ {H,U,K,L} = level type,
chars 1:3 = level number); per building, the max number per type is
aggregated through the dwelling→building link table, then projected to
OSM tags: building:levels = max(H)+max(U) when > 1, roof:levels = max(L)
when > 0.

Shape: two broadcastable/shuffled equi-joins + one conditional-max hash
aggregation — all native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import level_code_cols


def building_levels(
    dwellings: DataFrame,
    link: DataFrame,
    *,
    dwelling_id: str = "bruksenhetId",
    code_col: str = "bruksenhetsnummerTekst",
    ref_col: str = "ref",
) -> DataFrame:
    """dwellings(bruksenhetId, bruksenhetsnummerTekst) ⋈ link(ref,
    bruksenhetId) → (ref, building_levels, roof_levels), nulls where the
    reference emits no tag (building2osm.py:756-768)."""
    level_type, level_num = level_code_cols(F.col(code_col))
    # the reference skips falsy codes (building2osm.py:746); NULL/empty
    # rows must not reach the cast or the type test
    parsed = dwellings.filter(
        F.col(code_col).isNotNull() & (F.col(code_col) != "")
    ).select(
        F.col(dwelling_id),
        level_type.alias("__t"),
        level_num.alias("__n"),
    )
    joined = link.join(parsed, dwelling_id)
    agg = joined.groupBy(ref_col).agg(
        F.max(F.when(F.col("__t") == "H", F.col("__n"))).alias("h"),
        F.max(F.when(F.col("__t") == "U", F.col("__n"))).alias("u"),
        F.max(F.when(F.col("__t") == "K", F.col("__n"))).alias("k"),
        F.max(F.when(F.col("__t") == "L", F.col("__n"))).alias("l"),
    )
    hu = F.coalesce(F.col("h"), F.lit(0)) + F.coalesce(F.col("u"), F.lit(0))
    # roof:levels is only emitted inside the H+U > 1 branch
    # (building2osm.py:757-762): L>0 alone never produces the tag.
    return agg.select(
        ref_col,
        F.when(hu > 1, hu).alias("building_levels"),
        F.when((hu > 1) & (F.col("l") > 0), F.col("l")).alias("roof_levels"),
    )
