"""Structured Streaming layer: file-source stream -> windowed agg /
sessionization -> metastore sink."""

import os
import time

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark.streaming import (
    read_stream,
    sessionize_stream,
    stream_to_dataset,
    windowed_agg,
)


@pytest.fixture()
def stream_dir(session, tmp_path):
    d = str(tmp_path / "stream_src")
    df = session.spark.createDataFrame(
        [
            (1, "2024-01-01 00:05:00", 10.0),
            (1, "2024-01-01 00:10:00", 20.0),
            (2, "2024-01-01 01:00:00", 5.0),
            (1, "2024-01-01 02:00:00", 7.0),
        ],
        "user_id long, ts_str string, value double",
    ).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    df.write.parquet(d)
    return d


def test_windowed_agg_stream(session, stream_dir, tmp_path):
    spark = session.spark
    stream = read_stream(spark, stream_dir)
    assert stream.isStreaming
    agg = windowed_agg(
        stream, "ts", "1 hour", watermark="2 hours",
        group_cols=["user_id"],
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, n, total FROM win_agg ORDER BY user_id, total").collect()
    assert (1, 2, 30.0) in [tuple(r) for r in rows]  # two events in hour 0
    assert (1, 1, 7.0) in [tuple(r) for r in rows]


def test_sessionize_stream(session, stream_dir, tmp_path):
    spark = session.spark
    stream = read_stream(spark, stream_dir)
    sess_df = sessionize_stream(stream, "ts", "user_id", gap="30 minutes")
    q = (
        sess_df.writeStream.format("memory")
        .queryName("sess_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, n_events FROM sess_agg").collect()
    per_user = sorted((r["user_id"], r["n_events"]) for r in rows)
    # user 1: two sessions (00:05+00:10 within gap; 02:00 separate)
    assert per_user == [(1, 1), (1, 2), (2, 1)]


def test_stream_to_dataset_sink(session, stream_dir, tmp_path):
    spark = session.spark
    stream = read_stream(spark, stream_dir)
    q = stream_to_dataset(
        stream, "stream_ds", session.metastore, str(tmp_path / "cp3")
    )
    q.awaitTermination(120)
    back = dc.read_dataset("stream_ds", session=session)
    assert back.count() == 4
    rec = session.metastore.get_record("stream_ds")
    assert rec.latest_version().attrs.get("stream_batch_id") is not None


def test_stateful_running_counts(session, stream_dir, tmp_path):
    from datachain_spark.streaming import running_counts_stateful

    spark = session.spark
    stream = read_stream(spark, stream_dir)
    counts = running_counts_stateful(stream, "user_id", "value")
    q = (
        counts.writeStream.format("memory")
        .queryName("state_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM state_counts").collect()}
    assert rows[1] == (3, 37.0)
    assert rows[2] == (1, 5.0)


def test_dedup_stream(session, tmp_path):
    from datachain_spark.streaming import dedup_stream

    spark = session.spark
    d = str(tmp_path / "dup_src")
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:05:00", "a"),
            (1, "2024-01-01 00:06:00", "a-dup"),     # same key within horizon
            (2, "2024-01-01 00:10:00", "b"),
            (1, "2024-01-01 03:00:00", "a-later"),   # same key past watermark
        ],
        "k long, ts_str string, v string",
    ).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    df.write.parquet(d)

    stream = read_stream(spark, d, max_files_per_trigger=1)
    deduped = dedup_stream(stream, ["k"], ts_col="ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp5"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ks = [r["k"] for r in spark.sql("SELECT k FROM dedup_out").collect()]
    # both keys survive exactly once per watermark horizon; the within-horizon
    # duplicate of k=1 is dropped
    assert sorted(ks)[:2] == [1, 2] and ks.count(1) <= 2
