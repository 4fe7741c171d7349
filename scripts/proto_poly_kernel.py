"""Round-6 prototype: in-kernel vectorized sliding polynomial (xxhash64
path) vs JVM _shingle_bases, for cross_doc_ngram_profile. Checks value
identity and speed."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

import bench as B  # noqa: E402

M = (1 << 31) - 1


def poly_windows_np(flat, lens, k):
    """Per-doc sliding k-polynomial over concatenated word-hash arrays.
    Matches _shingle_bases: n-k+1 windows when n >= k, else one whole-doc
    Horner fold. Returns (out_flat, out_lens)."""
    n_docs = lens.size
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    L = flat.size
    out_lens = np.where(lens >= k, lens - k + 1, 1).astype(np.int64)
    total = int(out_lens.sum())
    out = np.empty(total, dtype=np.int64)
    W = L - k + 1
    if W > 0:
        b = np.zeros(W, dtype=np.int64)
        for j in range(k):
            np.multiply(b, 1000003, out=b)
            np.add(b, flat[j:j + W], out=b)
            np.mod(b, M, out=b)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        valid = doc_of[:W] == doc_of[k - 1:]
    else:
        b = np.empty(0, dtype=np.int64)
        valid = np.empty(0, dtype=bool)
    long_doc = lens >= k
    out_doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), out_lens)
    out_is_long = long_doc[out_doc_of]
    out[out_is_long] = b[valid]
    short_idx = np.flatnonzero(~long_doc)
    for d in short_idx:
        acc = 0
        for x in flat[starts[d]:starts[d] + lens[d]]:
            acc = (acc * 1000003 + int(x)) % M
        out[out_doc_of == d] = acc
    return out, out_lens


def main() -> None:
    from building2osm_spark.session import get_spark
    from building2osm_spark.operators import dedupe as DD

    spark = get_spark(app="proto-poly", cores=B.CPUS)
    docs = spark.read.parquet(B.bench_path("docs_500k"))

    def t(label, fn, n=2):
        fn()
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{label:45s} {best:7.3f} s", flush=True)

    hs = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr(
            "transform(split(lower(text), '\\\\s+'),"
            f" w -> pmod(xxhash64(w), {M}))"
        ).alias("__hs"),
    )

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

    grams = hs.mapInArrow(gram_kernel, "doc_id string, __h long")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t("grams noop (poly-in-kernel)", lambda: noop(grams))

    prof = (
        grams.withColumn("__docs", F.count("*").over(Window.partitionBy("__h")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("__docs") >= 2).cast("long")).alias("dup_ngrams"),
        )
        .withColumn("dup_fraction", F.col("dup_ngrams") / F.col("n_ngrams"))
    )
    t("poly-kernel full profile", lambda: prof.filter("dup_fraction > 0.5").count())
    print("flagged:", prof.filter("dup_fraction > 0.5").count(), flush=True)

    # value identity vs current path on a 20k sample (profiles equal)
    sample = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(25)) == 3)
    cur = DD.cross_doc_ngram_profile(sample, ngram=8, base_hash="xxhash64")
    hs_s = sample.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr(
            "transform(split(lower(text), '\\\\s+'),"
            f" w -> pmod(xxhash64(w), {M}))"
        ).alias("__hs"),
    )
    grams_s = hs_s.mapInArrow(gram_kernel, "doc_id string, __h long")
    new = (
        grams_s.withColumn("__docs", F.count("*").over(Window.partitionBy("__h")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("__docs") >= 2).cast("long")).alias("dup_ngrams"),
        )
        .withColumn("dup_fraction", F.col("dup_ngrams") / F.col("n_ngrams"))
    )
    diff = cur.exceptAll(new).count() + new.exceptAll(cur).count()
    print("sample profile diff rows:", diff, "(0 == identical)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
