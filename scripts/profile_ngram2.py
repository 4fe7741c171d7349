"""Round-6 diagnostic: ngram_dup_500k formulation variants."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

import bench as B  # noqa: E402


def main() -> None:
    from building2osm_spark.session import get_spark
    from building2osm_spark.operators import dedupe as DD

    spark = get_spark(app="profile-ngram2", cores=B.CPUS)
    docs = spark.read.parquet(B.bench_path("docs_500k"))

    def t(label, fn, n=2):
        fn()
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{label:45s} {best:7.3f} s", flush=True)
        return best

    def profile_from(grams):
        return (
            grams.withColumn("__docs", F.count("*").over(Window.partitionBy("__h")))
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_ngrams"),
                F.sum((F.col("__docs") >= 2).cast("long")).alias("dup_ngrams"),
            )
            .withColumn("dup_fraction", F.col("dup_ngrams") / F.col("n_ngrams"))
        )

    # Variant A: all-JVM — array_distinct per doc, checkpoint, explode
    def variant_a():
        bases = DD._shingle_bases(docs, "text", "doc_id", 8, "xxhash64")
        uniq = bases.select(
            "doc_id", F.array_distinct("__bases").alias("__u")
        ).localCheckpoint(eager=False)
        grams = uniq.select("doc_id", F.explode("__u").alias("__h"))
        return profile_from(grams).filter("dup_fraction > 0.5").count()

    t("A: JVM array_distinct+ckpt+explode+window", variant_a)

    # Variant B: kernel emits per-doc unique arrays; JVM explodes
    def uniq_arr_kernel(batches):
        for pdf in batches:
            out_ids, out_arrs = [], []
            for doc_id, bs in zip(pdf["doc_id"], pdf["__bases"]):
                arr = np.unique(np.asarray(bs, dtype=np.int64))
                out_ids.append(doc_id)
                out_arrs.append(arr)
            yield pd.DataFrame({"doc_id": out_ids, "__u": out_arrs})

    def variant_b():
        bases = DD._shingle_bases(docs, "text", "doc_id", 8, "xxhash64")
        id_t = bases.schema["doc_id"].dataType.simpleString()
        uniq = bases.mapInPandas(uniq_arr_kernel, schema=f"doc_id {id_t}, __u array<long>")
        grams = uniq.select("doc_id", F.explode("__u").alias("__h"))
        return profile_from(grams).filter("dup_fraction > 0.5").count()

    t("B: kernel arrays + JVM explode + window", variant_b)

    # floor probes
    hs = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr("transform(split(lower(text), '\\\\s+'), w -> pmod(xxhash64(w), 2147483647))").alias("__hs"),
    )
    t("word-hash noop (no poly)", lambda: hs.write.format("noop").mode("overwrite").save())
    spark.stop()


if __name__ == "__main__":
    main()
