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


def test_stream_sessionize_state_across_batches(spark, tmp_path):
    """Sessions must CONTINUE across micro-batches: events for one user
    split over two files; the session spanning the file boundary is
    re-emitted extended, and last-emission-per-(user, session) equals the
    batch sessionization."""
    import datetime

    from dbimport_spark.streaming.ops import stream_sessionize

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, user, minutes):
        return (eid, user, t0 + datetime.timedelta(minutes=minutes))

    # user 7: events at 0,10 | file2: 20, 120 -> sessions {0,10,20} and {120}
    # user 8: events at 0 | file2: 50 -> two sessions (gap 50 > 30)
    batch1 = [ev(1, 7, 0), ev(2, 7, 10), ev(3, 8, 0)]
    batch2 = [ev(4, 7, 20), ev(5, 7, 120), ev(6, 8, 50)]
    d = tmp_path / "sess_in"
    d.mkdir()
    schema = "event_id long, user_id long, ts timestamp"
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(str(d / "f1.parquet"))
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(str(d / "f2.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*.parquet"))
    )
    name = "sess_test_out"
    q = (
        stream_sessionize(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    # last emission per (user, session): max n_events wins (re-emission extends)
    final = {}
    for r in rows:
        k = (r["user_id"], r["session_id"])
        if k not in final or r["n_events"] >= final[k]["n_events"]:
            final[k] = r
    got = {
        k: (v["n_events"], v["session_start"].minute, v["session_end"].minute)
        for k, v in final.items()
    }
    assert got[(7, 1)][0] == 3 and got[(7, 1)][2] == 20  # spans the boundary
    assert got[(7, 2)] == (1, 0, 0)  # 120min event, own session
    assert got[(8, 1)][0] == 1
    assert got[(8, 2)][0] == 1


def test_stream_dedup_bloom_drops_planted(spark, sf_dir):
    from dbimport_spark.plans.registry import QUERIES

    out = QUERIES["stream_dedup_bloom"](spark, sf_dir)
    kept = {r["doc_id"] for r in out.collect()}
    assert kept, "odd half should survive"
    assert not {d for d in kept if d >= 1000000}, "planted dupes must be dropped"


def test_stream_interval_join_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from dbimport_spark.plans.registry import QUERIES, load_events

    got = {
        (r["purchase_id"], r["signup_id"])
        for r in QUERIES["stream_interval_join"](spark, sf_dir).collect()
    }
    e = load_events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("sid"), F.col("user_id").alias("su"), F.col("ts").alias("sts")
    )
    want = {
        (r["pid"], r["sid"])
        for r in p.join(
            s,
            (F.col("pu") == F.col("su"))
            & (F.col("pts") >= F.col("sts"))
            & (F.col("pts") <= F.col("sts") + F.expr("INTERVAL 24 HOURS")),
        ).collect()
    }
    assert got == want and want
