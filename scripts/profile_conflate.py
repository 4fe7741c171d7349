"""Round-6 diagnostic: stage metrics for conflate_city_1m via UI REST."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import bench as B  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{B.CPUS}]")
        .appName("profile-conflate")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from building2osm_spark.operators.conflate import conflate

    osm = spark.read.parquet(B.bench_path("osm_city1m"))
    imp = spark.read.parquet(B.bench_path("imp_city1m"))
    q = conflate(osm, imp)
    q.count()  # warm
    sid0 = max(
        (s["stageId"] for s in json.load(urllib.request.urlopen(
            f"http://localhost:4050/api/v1/applications/"
            f"{spark.sparkContext.applicationId}/stages"))), default=0)
    t0 = time.time()
    n = q.count()
    print(f"full: {time.time()-t0:.3f} s  matches={n}", flush=True)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4050/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    for s in sorted((s for s in stages if s["stageId"] > sid0),
                    key=lambda s: s["stageId"]):
        print(
            f"stage {s['stageId']:3d} tasks={s['numCompleteTasks']:3d} "
            f"time={s['executorRunTime']/1000:7.1f}s cpu={s['executorCpuTime']/1e9:7.1f}s "
            f"srMB={s['shuffleReadBytes']/1e6:7.0f} swMB={s['shuffleWriteBytes']/1e6:7.0f} "
            f"fetchWait={s['shuffleFetchWaitTime']/1000:5.1f}s "
            f"spillMB={s['diskBytesSpilled']/1e6:6.0f} inMB={s['inputBytes']/1e6:6.0f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
