"""SparkSession factory with the engine's standard configuration.

Tuned for correctness tests on local[N] while keeping every knob meaningful
on a real multi-executor cluster: AQE with skew-join splitting on (the
engine's hot-cell handling relies on it as a second line of defence behind
explicit cell salting), Arrow enabled for the pandas-UDF kernels, shuffle
partitions sized to cores locally (a cluster deployment overrides via
spark-submit --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH = 16384  # rows per Arrow batch into numpy kernels (per-batch
# pandas/serde overhead dominates small batches; 16k amortizes it while a
# worst-case geometry batch stays ~15 MB)


def _warehouse_dir() -> str:
    env = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if env:
        return env
    import getpass
    import tempfile

    try:
        user = getpass.getuser()
    except Exception:
        user = str(os.getuid()) if hasattr(os, "getuid") else "anon"
    return os.path.join(tempfile.gettempdir(), f"b2o_spark_warehouse_{user}")


def get_spark(app: str = "building2osm_spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores) * 2, 8) if isinstance(cores, int) else 32
    master = f"local[{cores}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.sql.session.timeZone", "UTC")
        # bucketed-table warehouse (sources/bucketed.py) — keep catalog
        # data out of the repo/cwd; static config, so set at build time.
        # Per-user by default (a fixed shared /tmp path collides across
        # users/concurrent CI: write_bucketed drops dirs under it, and a
        # foreign-owned dir fails saveAsTable); SPARK_GRAFT_WAREHOUSE
        # overrides for deployments that want a shared catalog.
        .config("spark.sql.warehouse.dir", _warehouse_dir())
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE: mapKeyDedupPolicy stays at the default EXCEPTION — all tag
        # merges go through functions.columns.map_update, which implements
        # dict.update semantics without relying on session config (the
        # driver's oracle session runs Spark defaults).
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
