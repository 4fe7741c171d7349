"""Round-6 diagnostic: window-stage variants for ngram_dup (poly kernel)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

import bench as B  # noqa: E402
from proto_poly_kernel import poly_windows_np  # noqa: E402

M = (1 << 31) - 1


def main() -> None:
    from building2osm_spark.session import get_spark

    spark = get_spark(app="profile-ngram4", cores=B.CPUS)
    docs = spark.read.parquet(B.bench_path("docs_500k"))

    import pyarrow as pa

    def gram_kernel(batches):
        for batch in batches:
            ids = batch.column(0)
            lst = batch.column(1)
            n = len(lst)
            if n == 0:
                continue
            flat = lst.flatten().to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            lens = lst.value_lengths().to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            bases, out_lens = poly_windows_np(flat, lens, 8)
            doc_of = np.repeat(np.arange(n, dtype=np.int64), out_lens)
            keys = (doc_of << 31) | bases
            ukeys = np.unique(keys)
            h = ukeys & M
            d_idx = ukeys >> 31
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(d_idx, type=pa.int32())),
                 pa.array(h, type=pa.int64())],
                ["doc_id", "__h"],
            )

    hs = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr(
            "transform(split(lower(text), '\\\\s+'),"
            f" w -> pmod(xxhash64(w), {M}))"
        ).alias("__hs"),
    )
    grams = hs.mapInArrow(gram_kernel, "doc_id string, __h long")

    def t(label, fn, n=2):
        fn()
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{label:45s} {best:7.3f} s", flush=True)

    def prof_window(g):
        return (
            g.withColumn("__docs", F.count("*").over(Window.partitionBy("__h")))
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_ngrams"),
                F.sum((F.col("__docs") >= 2).cast("long")).alias("dup_ngrams"),
            )
            .withColumn("dup_fraction", F.col("dup_ngrams") / F.col("n_ngrams"))
        )

    for n_part in (160, 256):
        t(f"window after repartition({n_part})",
          lambda n_part=n_part: prof_window(
              grams.repartition(n_part, "__h")
          ).filter("dup_fraction > 0.5").count())

    # windowless: per-partition partial-count kernel after repartition
    def partial_kernel(batches):
        ids_all, hs_all = [], []
        for batch in batches:
            ids_all.append(batch.column(0))
            hs_all.append(
                batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            )
        if not ids_all:
            return
        ids = pa.chunked_array(ids_all).combine_chunks()
        enc = ids.dictionary_encode()
        d_idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = enc.dictionary
        h = np.concatenate(hs_all)
        _, inv, counts = np.unique(h, return_inverse=True, return_counts=True)
        isdup = counts[inv] >= 2
        n_docs = len(dictionary)
        n_per = np.bincount(d_idx, minlength=n_docs)
        dup_per = np.bincount(d_idx, weights=isdup, minlength=n_docs).astype(
            np.int64
        )
        yield pa.RecordBatch.from_arrays(
            [dictionary, pa.array(n_per, type=pa.int64()),
             pa.array(dup_per, type=pa.int64())],
            ["doc_id", "n_p", "dup_p"],
        )

    def prof_partial(n_part):
        partials = grams.repartition(n_part, "__h").mapInArrow(
            partial_kernel, "doc_id string, n_p long, dup_p long"
        )
        return (
            partials.groupBy("doc_id")
            .agg(F.sum("n_p").alias("n_ngrams"), F.sum("dup_p").alias("dup_ngrams"))
            .withColumn("dup_fraction", F.col("dup_ngrams") / F.col("n_ngrams"))
        )

    for n_part in (64, 160):
        t(f"partial-kernel({n_part})",
          lambda n_part=n_part: prof_partial(n_part).filter(
              "dup_fraction > 0.5").count())
    print("counts:", prof_window(grams.repartition(160, "__h")).filter(
        "dup_fraction > 0.5").count(),
        prof_partial(160).filter("dup_fraction > 0.5").count(), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
