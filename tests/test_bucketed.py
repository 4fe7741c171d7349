"""Bucketed spatial tables: the repeated-join workload skips its exchange."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from building2osm_spark.functions.columns import cell_id_col
from building2osm_spark.sources.bucketed import read_bucketed, write_bucketed
from building2osm_spark.sources import fixtures as FX


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    imgs = spark.createDataFrame(
        FX.images_pdf(2000, with_loc=True)[["image_id", "lon", "lat"]]
    ).withColumn("cell", cell_id_col(F.col("lon"), F.col("lat"), 14))
    # a second keyed table sharing the cell domain (stand-in for footprint covers)
    covers = imgs.select(F.col("cell"), F.col("image_id").alias("ref")).distinct()

    write_bucketed(imgs, "t_imgs", n_buckets=8)
    write_bucketed(covers, "t_covers", n_buckets=8)

    a = read_bucketed(spark, "t_imgs")
    b = read_bucketed(spark, "t_covers")

    # at test scale the planner would broadcast (bypassing bucketing
    # entirely); disable it to observe the big-table plan shape
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "cell")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_exchange = len(re.findall(r"Exchange", plan))
        assert n_exchange == 0, plan[:2000]
        assert "SortMergeJoin" in plan
        # results match the unbucketed join
        plain = imgs.join(covers, "cell")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS t_imgs")
    spark.sql("DROP TABLE IF EXISTS t_covers")
