"""Round-6 diagnostic: reproduce the in-session rectify_100k slowdown.

rectify_100k reads 2.5-3.4 s standalone but 8.7-13.9 s inside the full
bench window (four consecutive windows since round 4).  This harness runs
rectify_100k fresh, then replays the heavy corpus queries that precede it
in bench.py, then re-times rectify_100k in the same session.  If (c) >>
(a) the slowdown is session-state accumulation, not host noise.

Usage: python scripts/repro_insession.py [--skip QUERY ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bench as B  # noqa: E402 — reuse the frozen harness's fixtures/paths

SF_DIR = B.SF_DIR


def time_rectify(spark, label: str) -> float:
    from building2osm_spark.operators.geometry_passes import rectify_and_simplify

    path = B.bench_path("rect100k")
    spark.sparkContext.setJobDescription(f"rectify_100k [{label}]")
    job = lambda: rectify_and_simplify(spark.read.parquet(path)).count()  # noqa: E731
    job()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        job()
        best = min(best, time.time() - t0)
    print(f"rectify_100k [{label}]: {best:.3f} s", flush=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--heavy", nargs="*", default=None,
                    help="subset of heavy queries to replay between timings")
    args = ap.parse_args()

    from building2osm_spark.session import get_spark
    from building2osm_spark.operators import dedupe as DDop

    spark = get_spark(app="repro-insession", cores=B.CPUS)

    # make sure the rect100k fixture exists (untimed)
    from building2osm_spark.sources.fixtures import (
        GEOMETRY_POLYGON_T,
        building_geometries,
    )

    path = B.bench_path("rect100k")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark.createDataFrame(
            building_geometries(100_000),
            schema=f"ref string, geometry {GEOMETRY_POLYGON_T}",
        ).repartition(32).write.mode("overwrite").parquet(path)
    docs_path = B.bench_path("docs_500k")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        from building2osm_spark.sources.fixtures import distributed_documents
        distributed_documents(spark, 500_000).write.mode("overwrite").parquet(docs_path)

    a = time_rectify(spark, "fresh")

    heavy = {
        "minhash_500k": lambda: DDop.minhash_lsh_pairs(
            DDop.minhash_signatures(
                spark.read.parquet(docs_path), base_hash="xxhash64"
            ),
            bands=16,
            threshold=0.5,
        ).count(),
        "ngram_dup_500k": lambda: DDop.cross_doc_ngram_profile(
            spark.read.parquet(docs_path), ngram=8, base_hash="xxhash64"
        ).filter(F.col("dup_fraction") > 0.5).count(),
        "ngram_winnow_500k": lambda: DDop.winnowed_ngram_profile(
            spark.read.parquet(docs_path), ngram=8, window=8, base_hash="xxhash64"
        ).filter(F.col("dup_fraction") > 0.5).count(),
    }
    names = args.heavy if args.heavy is not None else list(heavy)
    for name in names:
        spark.sparkContext.setJobDescription(f"heavy: {name}")
        t0 = time.time()
        for _ in range(3):  # bench runs each 3x (warmup + 2 timed)
            heavy[name]()
        print(f"{name} x3: {time.time() - t0:.1f} s", flush=True)

    c = time_rectify(spark, "after-heavy")
    print(json.dumps({"fresh": round(a, 3), "after_heavy": round(c, 3),
                      "ratio": round(c / a, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
