"""Round-6 diagnostic: stage metrics for ngram_dup window stage via UI REST."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

import bench as B  # noqa: E402
from proto_poly_kernel import poly_windows_np  # noqa: E402  (same dir)

M = (1 << 31) - 1


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{B.CPUS}]")
        .appName("profile-ngram3")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
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
    prof = (
        grams.withColumn("__docs", F.count("*").over(Window.partitionBy("__h")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("__docs") >= 2).cast("long")).alias("dup_ngrams"),
        )
        .withColumn("dup_fraction", F.col("dup_ngrams") / F.col("n_ngrams"))
    )
    q = prof.filter("dup_fraction > 0.5")
    q.count()  # warm
    t0 = time.time()
    q.count()
    print(f"full: {time.time()-t0:.3f} s", flush=True)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4050/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    # last ~8 stages (the warm run + timed run)
    for s in sorted(stages, key=lambda s: -s["stageId"])[:8]:
        print(
            f"stage {s['stageId']:3d} tasks={s['numCompleteTasks']:3d} "
            f"time={s['executorRunTime']/1000:7.1f}s cpu={s['executorCpuTime']/1e9:7.1f}s "
            f"srMB={s['shuffleReadBytes']/1e6:7.0f} swMB={s['shuffleWriteBytes']/1e6:7.0f} "
            f"swTime={s['shuffleWriteTime']/1e9:5.1f}s fetchWait={s['shuffleFetchWaitTime']/1000:5.1f}s "
            f"spillMB={s['diskBytesSpilled']/1e6:6.0f} {s['name'][:40]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
