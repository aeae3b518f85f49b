"""Structured Streaming ops: windowed agg batch-equivalence, watermarked
dedup, foreachBatch upsert sink."""

import shutil

import pytest
from pyspark.sql import functions as F

from dbimport_spark.plans.registry import load_events
from dbimport_spark.streaming import (
    read_events_stream,
    stream_dedup,
    stream_upsert_sink,
    windowed_event_agg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    return str(d)


def test_windowed_agg_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    agg = windowed_event_agg(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = load_events(spark, SF)
    cents = F.round(F.col("value") * 10000).cast("bigint")
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / F.lit(10000.0)).alias("sum_value"),
        )
        .collect()
    }
    assert got == expected


def test_stream_dedup(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    deduped = stream_dedup(stream, ["user_id"], watermark="10 days")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n_users = load_events(spark, SF).select("user_id").distinct().count()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT user_id) AS u FROM dedup_out").collect()[0]
    assert got["u"] == got["n"]  # one row per key
    assert got["n"] <= load_events(spark, SF).count()
    assert got["n"] >= n_users  # watermark-bounded state may re-admit late keys


def test_stream_upsert_sink(spark, tmp_path):
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    tgt = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k long, name string, v double"
    ).coalesce(1).write.mode("overwrite").parquet(str(src_dir / "batch1"))
    spark.createDataFrame(
        [(2, "b2", 20.0), (3, "c", 3.0)], "k long, name string, v double"
    ).coalesce(1).write.mode("overwrite").parquet(str(src_dir / "batch2"))

    stream = (
        spark.readStream.schema("k long, name string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    q = stream_upsert_sink(stream, tgt, ["k"], ckpt)
    q.awaitTermination(120)
    result = {r["k"]: r for r in spark.read.parquet(tgt).collect()}
    assert set(result) == {1, 2, 3}
    assert result[2]["name"] == "b2" and result[2]["v"] == 20.0  # updated
    assert result[1]["name"] == "a"
