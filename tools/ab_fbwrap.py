"""Same-session A/B for wrapping foreachBatch streams in
_stream_parallelism (scale-adaptive shuffle width during the stream run).

Variant "off" monkeypatches streaming_queries._stream_parallelism to a
no-op (pre-change behavior); "on" leaves the wrap active. min over REPS
runs per cell, ABBA order, cache-clear + GC between runs.

Usage: python tools/ab_fbwrap.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]

    from pyspark.sql import SparkSession

    from dbimport_spark import recommended_confs
    from dbimport_spark.plans import QUERIES, streaming_queries

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_fbwrap")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
    )
    for k, v in recommended_confs(shuffle_partitions=int(cpus)).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    orig = streaming_queries._stream_parallelism

    @contextlib.contextmanager
    def noop(spark_, src):
        yield

    def run(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        return dt

    best: dict[tuple[str, str], float] = {}
    for rep in range(REPS):
        order = ("off", "on") if rep % 2 == 0 else ("on", "off")
        for variant in order:
            streaming_queries._stream_parallelism = (
                noop if variant == "off" else orig
            )
            for name in names:
                dt = run(name)
                key = (variant, name)
                best[key] = min(best.get(key, float("inf")), dt)
                print(f"rep{rep} {variant:3s} {name}: {dt:.2f}s", flush=True)
    streaming_queries._stream_parallelism = orig

    print("\n=== min over reps ===")
    for name in names:
        o, n = best[("off", name)], best[("on", name)]
        print(f"{name}: off {o:.2f}s  on {n:.2f}s  ratio {n / o:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
