"""Round-6 helper: time a subset of bench.py's queries with the same
warm-up + min-of-2 protocol, without the full harness.

    python scripts/bench_subset.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bench as B  # noqa: E402

SF_DIR = B.SF_DIR


def main() -> None:
    names = sys.argv[1:]
    from building2osm_spark.session import get_spark
    from building2osm_spark import driver_queries as DQ
    from building2osm_spark.operators import dedupe as DDop

    spark = get_spark(app="bench-subset", cores=B.CPUS)
    timings = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        fn()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"{name:28s} {best:7.3f} s", flush=True)

    def minhash_near_dups():
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
        sigs = DDop.minhash_signatures(docs, base_hash="xxhash64")
        return DDop.minhash_lsh_pairs(sigs, bands=16, threshold=0.5).count()

    def minhash_500k():
        docs = spark.read.parquet(B.bench_path("docs_500k"))
        sigs = DDop.minhash_signatures(docs, base_hash="xxhash64")
        return DDop.minhash_lsh_pairs(sigs, bands=16, threshold=0.5).count()

    def incremental_50k_vs_500k():
        docs = spark.read.parquet(B.bench_path("docs_500k"))
        index_sigs = spark.read.parquet(B.bench_path("sig_index_500k"))
        num = F.substring("doc_id", 5, 10).cast("long")
        near = docs.filter(num % 20 == 0).select(
            F.concat(F.lit("new_"), F.col("doc_id")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
        novel = docs.filter(num % 20 == 1).select(
            F.concat(F.lit("nov_"), F.col("doc_id")).alias("doc_id"),
            F.concat(
                F.lit("novel "), F.col("doc_id"),
                F.lit(" tokens nothing shared here "), F.md5(F.col("doc_id")),
            ).alias("text"),
        )
        new_sigs = DDop.minhash_signatures(
            near.unionByName(novel), base_hash="xxhash64"
        )
        return DDop.incremental_lsh_pairs(
            new_sigs, index_sigs, bands=16, threshold=0.5
        ).count()

    def ngram_dup_500k():
        prof = DDop.cross_doc_ngram_profile(
            spark.read.parquet(B.bench_path("docs_500k")), ngram=8,
            base_hash="xxhash64",
        )
        return prof.filter(F.col("dup_fraction") > 0.5).count()

    def ngram_winnow_500k():
        prof = DDop.winnowed_ngram_profile(
            spark.read.parquet(B.bench_path("docs_500k")), ngram=8, window=8,
            base_hash="xxhash64",
        )
        return prof.filter(F.col("dup_fraction") > 0.5).count()

    def decontaminate_500k():
        docs = spark.read.parquet(B.bench_path("docs_500k")).select("doc_id", "text")
        bench_docs = docs.filter(
            F.pmod(F.xxhash64("doc_id"), F.lit(250)) == 7
        ).select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.split("text", r"\s+"), 1, 30)).alias("text"),
        )
        return (
            DDop.decontaminate(
                docs, bench_docs, ngram=13, base_hash="xxhash64", min_overlap=3
            ).filter("contaminated").count()
        )

    def simhash_pairs():
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
        sims = DDop.simhash(docs, base_hash="xxhash64")
        return DDop.simhash_near_pairs(sims, max_hamming=3).count()

    def phash_dedup_500k():
        sims = spark.read.parquet(B.bench_path("imgs_nd_500000")).select(
            F.col("image_id").alias("doc_id"), F.col("phash").alias("simhash")
        )
        return DDop.simhash_near_pairs(sims, max_hamming=3).count()

    def phash_dense_100k():
        sims = spark.read.parquet(B.bench_path("imgs_dense_100k")).select(
            F.col("image_id").alias("doc_id"), F.col("phash").alias("simhash")
        )
        return DDop.simhash_near_pairs(sims, max_hamming=3, nested=True).count()

    def rectify_100k():
        from building2osm_spark.operators.geometry_passes import rectify_and_simplify

        return rectify_and_simplify(
            spark.read.parquet(B.bench_path("rect100k"))
        ).count()

    def rectify_simplify():
        return DQ.q_rectify_simplify(spark, SF_DIR).count()

    def knn_200k_x_10k():
        return B.knn_bench(spark, 200_000, 10_000)

    def conflate_city_1m():
        from building2osm_spark.operators.conflate import conflate

        return conflate(
            spark.read.parquet(B.bench_path("osm_city1m")),
            spark.read.parquet(B.bench_path("imp_city1m")),
        ).count()

    def overlay_4m_x_20k():
        from building2osm_spark.operators.overlay import raster_vector_overlay
        from building2osm_spark.sources.fixtures import (
            GEOMETRY_POLYGON_T,
            building_geometries,
        )

        polys = spark.createDataFrame(
            building_geometries(20_000),
            schema=f"ref string, geometry {GEOMETRY_POLYGON_T}",
        )
        pts = B.points_table(spark, 4_000_000).select(
            F.col("point_id").alias("image_id"), "lon", "lat"
        )
        return raster_vector_overlay(pts, polys, res=18).count()

    local = locals()
    for name in names:
        fn = local.get(name)
        if fn is None:
            print(f"unknown query {name}", flush=True)
            continue
        n = fn()  # also report result count once for evidence
        print(f"  {name} result count = {n}", flush=True)
        timed(name, fn)
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
