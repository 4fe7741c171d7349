"""Small dimension sources: building types, municipalities (S1/S2, J6/J11).

Both are broadcast-dim tables. The building-type tag parse reproduces
building2osm.py:330-349: osm_tag text "k=v + k=v" → map, spaces stripped,
default {'building': 'yes'} always present (explicit tags override it).
The municipality resolver reproduces get_municipality
(building2osm.py:358-379): digits pass through; exact case-insensitive
name match wins; else a UNIQUE substring match; else the input itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.columns import map_update

# full building_types.csv (129 rows, shape id;name;osm_tag) — the public
# Matrikkel type-code table the reference fetches at runtime
# (building2osm.py:330-351); committed under data/ so runs are hermetic.
_DATA_CSV = __import__("pathlib").Path(__file__).resolve().parent.parent / (
    "data/building_types.csv"
)


def _load_building_types_rows() -> list[tuple[str, str, str]]:
    import csv

    with open(_DATA_CSV, encoding="utf-8") as f:
        reader = csv.reader(f, delimiter=";")
        next(reader)  # header
        return [(r[0], r[1], r[2]) for r in reader]


BUILDING_TYPES_ROWS = _load_building_types_rows()


def building_types(spark: SparkSession, rows=None) -> DataFrame:
    """(type_id, name, tags map) — always broadcast-joined (J6).

    The tag parse handles the reference's full "k=v + k=v" grammar
    (building2osm.py:338-343) even though the current public CSV carries
    single-tag rows only; `rows` overrides the table for tests."""
    df = spark.createDataFrame(
        rows if rows is not None else BUILDING_TYPES_ROWS,
        schema="type_id string, name string, osm_tag string",
    )
    cleaned = F.regexp_replace(F.col("osm_tag"), " ", "")
    pairs = F.filter(F.split(cleaned, r"\+"), lambda p: p != "")
    parsed = F.map_from_entries(
        F.transform(
            pairs,
            lambda p: F.struct(
                F.split(p, "=")[0].alias("key"), F.split(p, "=")[1].alias("value")
            ),
        )
    )
    base = F.create_map(F.lit("building"), F.lit("yes"))
    # parsed usually carries its own building=* key; map_update keeps the
    # parsed value without a duplicate key (safe under the default
    # mapKeyDedupPolicy=EXCEPTION — the driver's session runs defaults)
    tags = F.when(F.size(pairs) > 0, map_update(base, parsed)).otherwise(base)
    return df.select("type_id", "name", tags.alias("tags"))


def enrich_building_tags(
    buildings: DataFrame, types: DataFrame, type_col: str = "building_type"
) -> DataFrame:
    """J6: broadcast type lookup; unknown codes keep NULL tags (the
    reference reports them, building2osm.py:681)."""
    return buildings.join(
        F.broadcast(types.withColumnRenamed("type_id", type_col)),
        type_col,
        "left",
    )


def compose_output_tags(enriched: DataFrame, tags_col: str = "tags") -> DataFrame:
    """F19: fold the deliberate output properties into the tag map, exactly
    the emission of building2osm.py:637-665:

      TYPE    '#<code> <name>' when the code is known, else '#<code>'
      STATUS  '#<code> <status name>' (status_codes, building2osm.py:54-65)
      DATE    date[:10] when present
      heritage 'yes' when the heritage flag is true
      SEFRAK  the sefrak ident when present

    TYPE/STATUS/DATE survive the uppercase cleanup (building2osm.py:1309 /
    operators.tags.drop_debug_tags); SEFRAK only under the `original` flag.
    All map surgery is native (create_map + map_filter of null values +
    map_update — dedup-policy-independent)."""
    from ..constants import STATUS_CODES

    cols = set(enriched.columns)

    def opt(name: str) -> Column:
        return F.col(name) if name in cols else F.lit(None).cast("string")

    status_name = F.element_at(
        F.create_map(*[F.lit(x) for kv in STATUS_CODES.items() for x in kv]),
        opt("status"),
    )
    extras = F.create_map(
        F.lit("TYPE"),
        F.when(
            opt("name").isNotNull(),
            F.concat(F.lit("#"), opt("building_type"), F.lit(" "), opt("name")),
        ).otherwise(F.concat(F.lit("#"), opt("building_type"))),
        F.lit("STATUS"),
        F.concat(F.lit("#"), opt("status"), F.lit(" "), status_name),
        F.lit("DATE"),
        F.substring(opt("date"), 1, 10),
        F.lit("heritage"),
        F.when(
            opt("heritage").cast("boolean"), F.lit("yes")
        ),
        F.lit("SEFRAK"),
        opt("sefrak"),
    )
    present = F.map_filter(extras, lambda _, v: v.isNotNull())
    base = F.coalesce(F.col(tags_col), F.create_map().cast("map<string,string>"))
    return enriched.withColumn(tags_col, map_update(base, present))


# -- municipalities ---------------------------------------------------------

MUNICIPALITIES_ROWS = [
    ("03", "Oslo fylke"),
    ("0301", "Oslo"),
    ("11", "Rogaland"),
    ("1103", "Stavanger"),
    ("30", "Viken"),
    ("3005", "Drammen"),
    ("3024", "Bærum"),
    ("46", "Vestland"),
    ("4601", "Bergen"),
    ("50", "Trøndelag"),
    ("5001", "Trondheim"),
    ("2100", "Svalbard"),
    ("00", "Norge"),
]


def municipalities(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(MUNICIPALITIES_ROWS, schema="mun_id string, name string")


def resolve_municipality(munis: DataFrame, parameter: str) -> str:
    """get_municipality parity (building2osm.py:358-379). Driver-side by
    design: it resolves a CLI argument, not row data."""
    if parameter.isdigit():
        return parameter
    rows = munis.select("mun_id", "name").collect()
    low = parameter.lower()
    found = ""
    duplicate = False
    for r in rows:
        name = r["name"].lower()
        if low == name:
            return r["mun_id"]
        if low in name:
            if found:
                duplicate = True
            else:
                found = r["mun_id"]
    return found if found and not duplicate else parameter
