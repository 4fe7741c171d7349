"""Bucketed spatial tables (NOTES backlog #8 / SURVEY §4 scale path).

Repeated conflation/overlay workloads join on a spatial cell key every
run; storing both sides bucketed (and sorted) by that key makes the
equi-join exchange-free — Spark reads co-located buckets and joins
without shuffling either side. This is the 100-TB pattern for a standing
pipeline: pay one bucketed write, then every nightly conflation / overlay
/ kNN candidate join over the same keys runs map-side.

Buckets are hash(cell) mod n — unaffected by the skew of cell POPULATIONS
per row (a hot cell still lands in one bucket; AQE skew handling applies
inside the join), but the usual dominant cost, the two-sided exchange of
the big tables, is gone. Plan shape is asserted in
tests/test_bucketed.py (zero Exchange on the bucketed join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str = "cell",
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a parquet table bucketed (and sorted) by bucket_col.
    Registered in the session catalog; readable by read_bucketed."""
    spark = df.sparkSession
    if mode == "overwrite":
        # a managed-table location can survive a crashed writer or a fresh
        # in-memory catalog; drop both the catalog entry and the orphan dir.
        # The managed location is <warehouse>/[<db>.db/]<table-lowercased>
        # (identifiers are stored lowercased; the default database lives at
        # the warehouse root) — building it from the raw name would miss
        # the orphan for qualified or mixed-case names and saveAsTable
        # would then fail on the non-empty location.
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        parts = [p.lower() for p in table.split(".")]
        if len(parts) == 1:
            rel = parts[0]
        elif len(parts) == 2:
            rel = parts[1] if parts[0] == "default" else f"{parts[0]}.db/{parts[1]}"
        else:
            raise ValueError(f"unsupported table identifier: {table!r}")
        jvm = spark.sparkContext._jvm
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        path = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{rel}")
        fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    # Repartition on the bucket key FIRST (same murmur3 hash as bucketBy):
    # each writer task then holds exactly one bucket → n_buckets files.
    # Without it every writer task spills a file per bucket it touches
    # (tasks × buckets files — measured 2049 files and +65% bytes at 1M
    # rows vs 32 files after this fix; the scan penalty made the bucketed
    # 1M conflation SLOWER than the exchange it saved).
    from pyspark.sql import functions as F

    df = df.repartition(n_buckets, F.col(bucket_col))
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata survives, so joins/aggregations on
    the bucket column skip their exchange."""
    return spark.table(table)


def write_conflation_base(
    osm: DataFrame,
    imports: DataFrame,
    *,
    prefix: str = "conf_base",
    n_buckets: int | None = None,
) -> tuple[str, str]:
    """Persist the standing-pipeline conflation base: `osm` bucketed by
    osm_id as <prefix>_osm and `imports` bucketed by ref as
    <prefix>_imports.

    These are exactly the keys of conflate()'s two ring-payload re-joins
    (operators/conflate.py _scored_candidates) — the dominant shuffles of
    the scoring stage at city scale (NOTES round-3 profile: two 1M-ring
    exchanges of the 5.2 s scoring stage). A bucketed scan's projection/
    filter chain preserves the bucket distribution, so conflate() picks
    the exchange-free plan with no code awareness (plan-asserted in
    tests/test_bucketed.py). Pay this write once; every subsequent
    conflation against the same base (nightly imports vs a stable OSM
    snapshot, or re-runs at new margins) skips both ring exchanges via
    operators.conflate.conflate_from_base.

    n_buckets defaults to spark.sql.shuffle.partitions so the probe
    side's exchange partitioning lines up with the buckets.
    """
    spark = osm.sparkSession
    n = n_buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    write_bucketed(osm, f"{prefix}_osm", bucket_col="osm_id", n_buckets=n)
    write_bucketed(imports, f"{prefix}_imports", bucket_col="ref", n_buckets=n)
    return f"{prefix}_osm", f"{prefix}_imports"
