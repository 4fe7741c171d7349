"""Driver contract for the spark-graft builder (PySpark target).

entry():      flagship point-in-polygon tile assignment + kNN fallback on
              the sf0.001 tables (customer-derived points → district grid).
queries():    one entry per implemented operator from SURVEY.md §2 and the
              training-data additions — see building2osm_spark/driver_queries.py.
oracle_sql(): DuckDB-equivalent SQL for EVERY entry (55/55): independent
              SQL formulations where expressible (incl. the md5-60bit hash
              family shared bit-exactly by Spark and DuckDB), and committed
              expected-output parquet (parity-proven goldens,
              scripts/gen_expected.py) for the grouped geometry / image
              kernels.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from building2osm_spark import driver_queries as DQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: assign customer-derived
    points to the district grid (cover join + exact PIP refine), attach the
    nearest supplier-derived target per district centroidal sample, and
    return per-district assignment counts."""
    sf_dir = "/root/testdata/sf0.001"
    assigned = DQ.q_pip_grid(spark, sf_dir)
    knn = (
        DQ.q_knn_nearest(spark, sf_dir)
        .groupBy("target_id")
        .agg(F.count("*").alias("n_nearest"))
    )
    # unconditioned join against a 1-row aggregate: deliberately a 1×N
    # broadcast nested-loop (constant fan-out), not a data-sized cross join
    return assigned.join(
        knn.select(F.sum("n_nearest").alias("n_knn_total"))
    ).orderBy("district")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(DQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(DQ.ORACLES)
