"""Round-6 (resumed) A/B: ring payloads re-joined after the bbox filter
(current) vs carried through the candidate stream (broadcast regime).

Same-session, interleaved A/B/A/B, min-of-2 per variant, on the 1M city
bench fixture. Counts must be identical (699,992)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

import bench as B  # noqa: E402

from building2osm_spark.operators.conflate import (  # noqa: E402
    _mutual_best,
    _scored_candidates,
    anti_join_earlier_imports,
    CONFLATE_RES,
    MARGIN_HAUSDORFF,
    MARGIN_TAGGED,
    MARGIN_AREA,
)
from building2osm_spark.operators.knn import _neighbors9  # noqa: E402
from building2osm_spark.functions.columns import (  # noqa: E402
    cell_id_col,
    coordinate_offset_cols,
)
from building2osm_spark.functions.udfs import hausdorff_udf  # noqa: E402


def scored_carry(osm, imports, margin_hausdorff):
    """Variant B: rings ride the candidate stream; no ring re-joins."""
    imp_all = anti_join_earlier_imports(imports, osm)
    imp = imp_all.select(
        F.col("ref").alias("i_ref"),
        F.col("c_lon").alias("i_lon"),
        F.col("c_lat").alias("i_lat"),
        F.col("area").alias("i_area"),
        F.col("ring").alias("i_ring"),
    )
    o_all = osm.filter(F.col("ref_tag").isNull())
    o = o_all.select(
        "osm_id",
        F.col("c_lon").alias("o_lon"),
        F.col("c_lat").alias("o_lat"),
        F.col("area").alias("o_area"),
        "tagged",
        F.col("ring").alias("o_ring"),
    )
    cand = (
        imp.withColumn(
            "__cells", _neighbors9(F.col("i_lon"), F.col("i_lat"), CONFLATE_RES)
        )
        .select("*", F.explode("__cells").alias("__cell"))
        .drop("__cells")
        .join(
            o.withColumn(
                "__cell", cell_id_col(F.col("o_lon"), F.col("o_lat"), CONFLATE_RES)
            ),
            "__cell",
        )
        .drop("__cell")
    )
    o_minlon, o_minlat = coordinate_offset_cols(
        F.col("o_lon"), F.col("o_lat"), -2.0 * margin_hausdorff
    )
    o_maxlon, o_maxlat = coordinate_offset_cols(
        F.col("o_lon"), F.col("o_lat"), +2.0 * margin_hausdorff
    )
    i_minlon, i_minlat = coordinate_offset_cols(
        F.col("i_lon"), F.col("i_lat"), -2.0 * margin_hausdorff
    )
    i_maxlon, i_maxlat = coordinate_offset_cols(
        F.col("i_lon"), F.col("i_lat"), +2.0 * margin_hausdorff
    )
    cand = cand.withColumn(
        "fwd",
        (o_minlon < F.col("i_lon")) & (F.col("i_lon") < o_maxlon)
        & (o_minlat < F.col("i_lat")) & (F.col("i_lat") < o_maxlat),
    ).withColumn(
        "rev",
        (i_minlon < F.col("o_lon")) & (F.col("o_lon") < i_maxlon)
        & (i_minlat < F.col("o_lat")) & (F.col("o_lat") < i_maxlat),
    ).filter(F.col("fwd") | F.col("rev"))
    return cand.withColumn(
        "hausdorff_m", hausdorff_udf(F.col("o_ring"), F.col("i_ring"))
    ).drop("o_ring", "i_ring")


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{B.CPUS}]")
        .appName("ab-conflate-carry")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    osm = spark.read.parquet(B.bench_path("osm_city1m"))
    imp = spark.read.parquet(B.bench_path("imp_city1m"))

    def q_old():
        scored = _scored_candidates(osm, imp, MARGIN_HAUSDORFF)
        m = _mutual_best(scored, MARGIN_HAUSDORFF, MARGIN_TAGGED, MARGIN_AREA)
        return m.filter("accepted").count()

    def q_new():
        scored = scored_carry(osm, imp, MARGIN_HAUSDORFF)
        m = _mutual_best(scored, MARGIN_HAUSDORFF, MARGIN_TAGGED, MARGIN_AREA)
        return m.filter("accepted").count()

    # warm both
    print("warm old:", q_old(), flush=True)
    print("warm new:", q_new(), flush=True)
    for rep in range(2):
        for name, q in (("old", q_old), ("new", q_new)):
            spark.sparkContext.setJobDescription(f"{name}-{rep}")
            t0 = time.time()
            n = q()
            print(f"{name} rep{rep}: {time.time()-t0:.3f} s n={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
