"""Standalone scale soak for the temporal joins (asof_join /
interval_join), mirroring the sessionize/pack_sequences soak protocol:
deterministic synthetic events (pure function of id, generated
executor-side via range()), materialized to parquet first, timed warm
on local[32] with the machine otherwise idle.

  python scripts/soak_temporal.py [--n 10000000] [--users 100000]

Shape: n events over 30 days; 20% clicks (probe side), 20% purchases
(right side — aggregated to unique (user, ts) exactly like the driver
query). asof picks the at-or-before purchase per click within a 6 h
tolerance; interval joins clicks into ±2 h windows around purchases.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from building2osm_spark.session import get_spark  # noqa: E402
from building2osm_spark.operators.asof import asof_join, interval_join  # noqa: E402

TOL_US = 6 * 3_600_000_000
HALF_US = 7_200_000_000
SPAN_US = 30 * 86_400_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/soak_temporal")
    args = ap.parse_args()

    spark = get_spark(app="soak_temporal", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    path = f"{args.out}/events_{args.n}.parquet"
    if not os.path.exists(path):
        # splitmix64-style mix of id -> (user, ts offset, type); pure
        # function of id, deterministic under any partitioning.
        ev = spark.range(args.n).select(
            F.col("id").alias("event_id"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(args.users)).alias("user_id"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(SPAN_US)).alias("ts_us"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(5)).alias("kind"),
        )
        ev.write.mode("overwrite").parquet(path)
    ev = spark.read.parquet(path)

    lefts = ev.where(F.col("kind") == 0).select("event_id", "user_id", "ts_us")
    rights = (
        ev.where(F.col("kind") == 1)
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("quote_id"))
    )

    def timed(fn):
        fn()  # warm (plan/codegen + page cache)
        t0 = time.time()
        n = fn()
        return time.time() - t0, n

    asof_sec, asof_rows = timed(
        lambda: asof_join(
            lefts, rights, "user_id", ts_col="ts_us",
            payload=["quote_id"], tolerance_us=TOL_US,
        ).where(F.col("quote_id").isNotNull()).count()
    )

    ivals = ev.where(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.col("ts_us") - HALF_US).alias("start_us"),
        (F.col("ts_us") + HALF_US).alias("end_us"),
    )
    ival_sec, ival_pairs = timed(
        lambda: interval_join(
            lefts.withColumnRenamed("event_id", "click_id"), ivals, "user_id",
            ts_col="ts_us", start_col="start_us", end_col="end_us",
            bucket_us=2 * HALF_US,
        ).count()
    )

    print(json.dumps({
        "n_events": args.n,
        "n_users": args.users,
        "asof_sec": round(asof_sec, 2),
        "asof_matched": asof_rows,
        "asof_clicks_per_sec": round(args.n / 5 / asof_sec),
        "interval_sec": round(ival_sec, 2),
        "interval_pairs": ival_pairs,
    }))


if __name__ == "__main__":
    main()
