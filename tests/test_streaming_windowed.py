"""Event-time windowed PIP counts + stateful streaming dedupe."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from building2osm_spark.sources import fixtures as FX
from building2osm_spark.streaming.windowed import (
    streaming_dedupe_first_seen,
    windowed_district_counts,
)

EVENTS_SCHEMA = "point_id long, lon double, lat double, event_time timestamp"


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _parse(rows):
    return [(i, lon, lat, dt.datetime.fromisoformat(ts)) for i, lon, lat, ts in rows]


def _run_window_query(spark, feed, ckpt):
    subs = FX.spark_subdivisions(spark, 2, 2)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(feed)
    out = windowed_district_counts(
        stream, subs, window="1 minute", watermark="2 minutes"
    )
    rows: list = []

    def capture(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_windowed_pip_counts_and_watermark(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    # districts tile BBOX (10.60..11.00, 59.85..60.05); put points inside
    batch1 = [
        (1, 10.65, 59.90, "2026-01-01 10:00:05"),
        (2, 10.65, 59.90, "2026-01-01 10:00:15"),
        (3, 10.95, 60.00, "2026-01-01 10:00:20"),
        (4, 10.65, 59.90, "2026-01-01 10:10:00"),  # advances watermark to 10:08
    ]
    _write_events(spark, feed, _parse(batch1))
    got1 = _run_window_query(spark, feed, ckpt)
    assert sum(r["n"] for r in got1) == 4
    # points 1,2 share a district+window; point 3 lands in another district
    assert sorted(r["n"] for r in got1) == [1, 1, 2]
    assert len({r["district"] for r in got1}) >= 2

    # second trigger: one fresh row + one row far behind the watermark
    batch2 = [
        (5, 10.65, 59.90, "2026-01-01 10:11:00"),  # fresh
        (6, 10.65, 59.90, "2026-01-01 09:50:00"),  # 18 min late → dropped
    ]
    _write_events(spark, feed, _parse(batch2))
    got2 = _run_window_query(spark, feed, ckpt)
    starts = [r["window"]["start"].strftime("%H:%M") for r in got2]
    assert "09:50" not in starts  # watermark (persisted in the checkpoint) dropped it
    assert "10:11" in starts


def test_streaming_dedupe_first_seen(spark, tmp_path):
    feed = str(tmp_path / "keys")
    ckpt = str(tmp_path / "kckpt")

    def write(keys):
        spark.createDataFrame([(k,) for k in keys], "key string").coalesce(
            1
        ).write.mode("append").parquet(feed)

    def run():
        stream = spark.readStream.schema("key string").parquet(feed)
        rows: list = []

        def capture(batch_df, batch_id):
            rows.extend(batch_df.collect())

        q = (
            streaming_dedupe_first_seen(stream, "key")
            .writeStream.foreachBatch(capture)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["key"]: r for r in rows}

    write(["a", "b", "a"])
    got1 = run()
    assert set(got1) == {"a", "b"}
    assert got1["a"]["n_duplicates_dropped"] == 1
    assert got1["b"]["n_duplicates_dropped"] == 0

    # second trigger: duplicate of 'a' suppressed entirely, 'c' is new
    write(["a", "c"])
    got2 = run()
    assert "c" in got2 and got2["c"]["n_duplicates_dropped"] == 0
    assert "a" not in got2  # already emitted in a prior batch


def test_streaming_dedupe_long_keys(spark, tmp_path):
    """Non-string key columns must flow through: the output key field is
    typed from the stream schema (a hardcoded StringType field fails
    Arrow conversion on long keys)."""
    feed = str(tmp_path / "lkeys")
    ckpt = str(tmp_path / "lckpt")
    spark.createDataFrame(
        [(7,), (8,), (7,)], "phash long"
    ).coalesce(1).write.mode("append").parquet(feed)
    stream = spark.readStream.schema("phash long").parquet(feed)
    rows: list = []
    q = (
        streaming_dedupe_first_seen(stream, "phash")
        .writeStream.foreachBatch(lambda df, _: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["key"]: r["n_duplicates_dropped"] for r in rows}
    assert got == {7: 1, 8: 0}
