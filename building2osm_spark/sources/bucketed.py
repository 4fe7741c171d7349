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
        # in-memory catalog; drop both the catalog entry and the orphan dir
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        jvm = spark.sparkContext._jvm
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        path = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{table}")
        fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata survives, so joins/aggregations on
    the bucket column skip their exchange."""
    return spark.table(table)
