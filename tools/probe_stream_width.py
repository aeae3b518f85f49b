"""Evidence probe for the scale-adaptive streaming width (r10 opt #1).

Runs one stateful streaming query (the stream_lake_cdc shape: lake CDC
source -> groupBy aggregation -> memory sink, availableNow) twice —
with the session width and with the adaptive width — and prints each
run's state-operator partition count from the engine's own progress
metrics plus the wall time, so the "32 state stores for 2 MB of input"
claim and its fix are auditable from the artifact without trusting the
bench deltas.

Usage: python tools/probe_stream_width.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dbimport_spark import recommended_confs, txnlog
    from dbimport_spark.plans.registry import load
    from dbimport_spark.sources.lakecdc import register_lake_cdc

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe_stream_width")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
    )
    for k, v in recommended_confs(shuffle_partitions=int(cpus)).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    register_lake_cdc(spark)

    path = os.path.join(
        tempfile.gettempdir(), "dbimport_spark_txn", "probe_stream_width"
    )
    if os.path.isdir(path):
        shutil.rmtree(path)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    txnlog.txn_append(spark, d.filter(F.col("doc_id") % 2 == 0), path)
    txnlog.txn_append(spark, d.filter(F.col("doc_id") % 2 == 1), path)

    from dbimport_spark.plans.streaming_queries import (
        _src_bytes,
        _stream_parallelism,
    )

    print(f"source bytes: {_src_bytes(path)}")

    def run(label: str, use_adaptive: bool) -> None:
        import uuid

        s = (
            spark.readStream.format("lake_cdc").option("path", path).load()
        )
        agg = s.groupBy(F.col("_commit_version").alias("version")).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        name = "probe_" + uuid.uuid4().hex[:8]
        ctx = _stream_parallelism(spark, path if use_adaptive else None)
        t0 = time.time()
        with ctx:
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        wall = time.time() - t0
        parts = [
            (op["operatorName"], op["numShufflePartitions"])
            for p in q.recentProgress
            for op in p["stateOperators"]
        ]
        print(f"{label}: wall {wall:.2f}s  stateOperators {parts}")

    for _ in range(2):  # twice: first run carries codegen JIT
        run("session width", use_adaptive=False)
        run("adaptive width", use_adaptive=True)

    spark.stop()


if __name__ == "__main__":
    main()
