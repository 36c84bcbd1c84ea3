"""Structured Streaming: file-drop tick source → watermark dedup →
foreachBatch upsert sink (SURVEY.md §2.9 T1/T2/T5), driven synchronously
with availableNow triggers."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sport_data_pipeline_spark.streaming.live import (
    dedup_late_ticks,
    read_tick_stream,
    session_window_stats,
    start_upsert_sink,
)

SCHEMA = "fixture_id long, status string, score string, scraped_at timestamp"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_stream_upsert_latest_wins(spark, tmp_path):
    src = str(tmp_path / "ticks")
    target = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")

    # poll 1: two fixtures scheduled
    _write_batch(spark, src, [
        (1, "scheduled", None, ts("2024-01-01T10:00")),
        (2, "scheduled", None, ts("2024-01-01T10:00")),
    ])
    schema = spark.read.parquet(src).schema
    stream = read_tick_stream(spark, src, schema)
    q = start_upsert_sink(
        stream, target, keys=["fixture_id"], order_by=["scraped_at"],
        checkpoint=ckpt, available_now=True,
    )
    q.awaitTermination(120)

    # poll 2: fixture 1 went live (newer scraped_at), fixture 3 appears
    _write_batch(spark, src, [
        (1, "live", "1-0", ts("2024-01-01T10:05")),
        (3, "scheduled", None, ts("2024-01-01T10:05")),
    ])
    q = start_upsert_sink(
        spark.readStream.format("parquet").schema(schema).load(src),
        target, keys=["fixture_id"], order_by=["scraped_at"],
        checkpoint=ckpt, available_now=True,
    )
    q.awaitTermination(120)

    got = {r["fixture_id"]: r["status"] for r in spark.read.parquet(target).collect()}
    assert got == {1: "live", 2: "scheduled", 3: "scheduled"}


def test_dedup_late_ticks(spark, tmp_path):
    src = str(tmp_path / "dup_ticks")
    _write_batch(spark, src, [
        (1, "live", "1-0", ts("2024-01-01T10:05")),
        (1, "live", "1-0", ts("2024-01-01T10:05")),  # duplicate poll
    ])
    schema = spark.read.parquet(src).schema
    stream = dedup_late_ticks(
        read_tick_stream(spark, src, schema), ["fixture_id"], "scraped_at"
    )
    q = (stream.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.sql("SELECT * FROM dedup_out").count() == 1


def test_session_window_stats(spark, tmp_path):
    src = str(tmp_path / "events_stream")
    rows = [
        (1, "click", "x", ts("2024-01-01T10:00")),
        (1, "click", "x", ts("2024-01-01T10:10")),
        (1, "click", "x", ts("2024-01-01T12:00")),  # new session (gap > 30m)
    ]
    spark.createDataFrame(rows, "user_id long, event_type string, s string, ts timestamp") \
        .withColumn("value", F.lit(1.0)).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    agg = session_window_stats(stream, "ts", gap="30 minutes")
    q = (agg.writeStream.format("memory").queryName("sess_out")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sess_out").collect()
    assert len(out) == 2
    assert sorted(r["n_events"] for r in out) == [1, 2]


def test_stream_stream_attribution_matches_batch_join(spark, tmp_path):
    """Watermarked stream-stream interval join == the same join in batch."""
    from sport_data_pipeline_spark.streaming.attribution import attribute_conversions

    eschema = "user_id long, ts timestamp, event_id long, value double"
    clicks_path = str(tmp_path / "clicks")
    purch_path = str(tmp_path / "purchases")
    click_rows = [
        (1, ts("2024-01-01T10:00"), 100, 1.0),
        (1, ts("2024-01-01T10:30"), 101, 2.0),   # both inside 1h window
        (1, ts("2024-01-01T08:00"), 102, 3.0),   # outside window
        (2, ts("2024-01-01T10:45"), 103, 4.0),   # other user
        (3, ts("2024-01-01T10:50"), 104, 5.0),   # user with no purchase
    ]
    purch_rows = [
        (1, ts("2024-01-01T10:59"), 200, 9.0),
        (2, ts("2024-01-01T11:00"), 201, 8.0),
        (4, ts("2024-01-01T11:00"), 202, 7.0),   # purchase with no clicks
    ]
    spark.createDataFrame(click_rows, eschema).coalesce(1).write.parquet(clicks_path)
    spark.createDataFrame(purch_rows, eschema).coalesce(1).write.parquet(purch_path)

    joined = attribute_conversions(
        spark.readStream.schema(eschema).parquet(clicks_path),
        spark.readStream.schema(eschema).parquet(purch_path),
        window_seconds=3600,
    )
    q = (joined.writeStream.format("memory").queryName("attrib_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["purchase_id"], r["click_id"])
           for r in spark.sql("SELECT * FROM attrib_out").collect()}
    assert got == {(200, 100), (200, 101), (201, 103)}
    lat = {r["click_id"]: r["seconds_before_purchase"]
           for r in spark.sql("SELECT * FROM attrib_out").collect()}
    assert lat[100] == 59 * 60.0 and lat[101] == 29 * 60.0
