"""Head-to-head: reference merge_buildings vs engine conflate on identical
input — the 'matches-or-beats the reference's single-node throughput'
evidence. Usage: python scripts/compare_reference_throughput.py [n_pairs]

The reference is O(N_osm × N_import) with a bbox prefilter and a reverse
rescan per candidate (building_merge.py:680-723); the engine is a
cell-bucketed join. Both run on the same host; the reference gets a single
core (it is single-threaded by construction), the engine gets local[32] —
that asymmetry IS the point (same machine, same data, engine parallelizes),
but the per-core rate is also reported for a like-for-like view.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")


def run_reference(osm_pdf, import_pdf) -> float:
    import building_merge as ref

    osm_buildings = []
    for _, r in osm_pdf.iterrows():
        way = {
            "type": "way", "id": int(r["osm_id"]), "nodes": [],
            "tags": dict(r["tags"]),
            "polygon": [tuple(p) for p in r["ring"]],
            "center": (float(r["c_lon"]), float(r["c_lat"])),
            "area": int(r["area"]),
        }
        if r["tagged"]:
            way["tagged"] = True
        osm_buildings.append(way)
    import_buildings = [
        {
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [[tuple(p) for p in r["ring"]]]},
            "properties": {"building": r["building"], "ref:bygningsnr": r["ref"]},
            "center": (float(r["c_lon"]), float(r["c_lat"])),
            "area": int(r["area"]),
        }
        for _, r in import_pdf.iterrows()
    ]
    ref.osm_buildings = osm_buildings
    ref.import_buildings = import_buildings
    ref.osm_elements = list(osm_buildings)
    ref.osm_nodes = {}
    ref.import_nodes = {}
    ref.osm_id = -1000000
    ref.debug = False
    t0 = time.time()
    ref.merge_buildings()
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    from building2osm_spark.session import get_spark
    from building2osm_spark.operators.conflate import conflate
    from building2osm_spark.sources.fixtures import (
        IMPORT_CONFLATE_SCHEMA,
        OSM_CONFLATE_SCHEMA,
        conflation_pdfs,
    )

    print(f"generating conflation fixture n={n} ...", file=sys.stderr)
    osm_pdf, import_pdf = conflation_pdfs(n)
    n_osm = len(osm_pdf)

    ref_sec = run_reference(osm_pdf, import_pdf)
    ref_rate = n_osm / ref_sec

    spark = get_spark(app="conflate-compare", cores=32)
    osm = spark.createDataFrame(osm_pdf, schema=OSM_CONFLATE_SCHEMA).cache()
    imports = spark.createDataFrame(import_pdf, schema=IMPORT_CONFLATE_SCHEMA).cache()
    osm.count(), imports.count()
    conflate(osm, imports).count()  # warm-up (codegen + workers)
    t0 = time.time()
    n_matches = conflate(osm, imports).count()
    eng_sec = time.time() - t0
    eng_rate = n_osm / eng_sec

    print(
        f"\nreference merge_buildings: {n_osm} osm buildings in {ref_sec:.2f}s "
        f"= {ref_rate:.0f} buildings/s (1 core, its own metric at building_merge.py:917)"
    )
    print(
        f"engine conflate:           {n_osm} osm buildings in {eng_sec:.2f}s "
        f"= {eng_rate:.0f} buildings/s (local[32]), {n_matches} matches"
    )
    print(f"speedup: {ref_sec / eng_sec:.1f}x  |  per-core: {ref_sec / eng_sec / 32:.2f}x")


if __name__ == "__main__":
    main()
