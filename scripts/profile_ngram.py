"""Round-6 diagnostic: stage decomposition of ngram_dup_500k."""

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

    spark = get_spark(app="profile-ngram", cores=B.CPUS)
    docs = spark.read.parquet(B.bench_path("docs_500k"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t(label, fn, n=2):
        fn()
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{label:45s} {best:7.3f} s", flush=True)
        return best

    bases = DD._shingle_bases(docs, "text", "doc_id", 8, "xxhash64")
    t("bases noop (JVM scan+poly)", lambda: noop(bases))

    id_t = bases.schema["doc_id"].dataType.simpleString()

    def uniq_kernel(batches):
        for pdf in batches:
            ids, hs = [], []
            for doc_id, bs in zip(pdf["doc_id"], pdf["__bases"]):
                arr = np.unique(np.asarray(bs, dtype=np.int64))
                if arr.size:
                    ids.append(np.full(arr.size, doc_id, dtype=object))
                    hs.append(arr)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "__h": np.concatenate(hs)}
                )

    grams = bases.mapInPandas(uniq_kernel, schema=f"doc_id {id_t}, __h long")
    t("grams noop (kernel, no exchange)", lambda: noop(grams))

    # current form: window count over __h
    prof_window = (
        grams.withColumn("__docs", F.count("*").over(Window.partitionBy("__h")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("__docs") >= 2).cast("long")).alias("dup_ngrams"),
        )
        .withColumn("dup_fraction", F.col("dup_ngrams") / F.col("n_ngrams"))
    )
    t("window-form full", lambda: prof_window.filter("dup_fraction > 0.5").count())

    # alternative: per-hash aggregation carrying (count, single doc id);
    # unique grams (count==1) attribute to their only doc; n_ngrams rides
    # along in the kernel output so the kernel runs once.
    def uniq_kernel_n(batches):
        for pdf in batches:
            ids, hs, ns = [], [], []
            for doc_id, bs in zip(pdf["doc_id"], pdf["__bases"]):
                arr = np.unique(np.asarray(bs, dtype=np.int64))
                if arr.size:
                    ids.append(np.full(arr.size, doc_id, dtype=object))
                    hs.append(arr)
                    ns.append(np.full(arr.size, arr.size, dtype=np.int64))
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "__h": np.concatenate(hs),
                     "__n": np.concatenate(ns)}
                )

    grams_n = bases.mapInPandas(uniq_kernel_n, schema=f"doc_id {id_t}, __h long, __n long")
    uniq = (
        grams_n.groupBy("__h")
        .agg(F.count("*").alias("__c"), F.first("doc_id").alias("doc_id"),
             F.first("__n").alias("__n"))
        .filter(F.col("__c") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("uniq_ngrams"), F.first("__n").alias("n_ngrams"))
    )
    prof_agg = uniq.withColumn(
        "dup_fraction", (F.col("n_ngrams") - F.col("uniq_ngrams")) / F.col("n_ngrams")
    )
    # docs with zero unique grams are all-dup (fraction 1.0 > 0.5): count =
    # all docs - docs with fraction <= 0.5... compare counts only (diagnostic)
    n_docs = docs.count()
    def agg_count():
        below = prof_agg.filter("dup_fraction <= 0.5").count()
        return n_docs - below
    t("agg-form full (count-equivalent)", agg_count)
    print("window flagged:", prof_window.filter("dup_fraction > 0.5").count(),
          " agg flagged:", agg_count(), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
