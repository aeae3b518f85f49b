"""Same-session A/B for the lazy-localCheckpoint optimization.

Cross-session noise on this box (canary swings up to ~1.5x, occasional
multi-second outliers) swamps the per-query effect size, so the A/B runs
BOTH variants interleaved in ONE session: variant "eager" monkeypatches
DataFrame.localCheckpoint to force eager=True (the pre-change behavior,
bit-identical plans), variant "lazy" leaves the code as written. Each
(variant, query) cell is min over REPS runs in ABBA order; caches are
cleared and the JVM GC'd between runs, bench.py-style.

Usage: python tools/ab_localckpt.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]

    from pyspark.sql import DataFrame, SparkSession

    from dbimport_spark import recommended_confs
    from dbimport_spark.plans import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_localckpt")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
    )
    for k, v in recommended_confs(shuffle_partitions=int(cpus)).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    orig = DataFrame.localCheckpoint

    def forced_eager(self, eager=True, storageLevel=None):
        if storageLevel is None:
            return orig(self, True)
        return orig(self, True, storageLevel)

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
        # ABBA ordering so slow drift hits both variants symmetrically
        order = ("eager", "lazy") if rep % 2 == 0 else ("lazy", "eager")
        for variant in order:
            DataFrame.localCheckpoint = forced_eager if variant == "eager" else orig
            for name in names:
                dt = run(name)
                key = (variant, name)
                best[key] = min(best.get(key, float("inf")), dt)
                print(f"rep{rep} {variant:5s} {name}: {dt:.2f}s", flush=True)
    DataFrame.localCheckpoint = orig

    print("\n=== min over reps ===")
    for name in names:
        e, l = best[("eager", name)], best[("lazy", name)]
        print(f"{name}: eager {e:.2f}s  lazy {l:.2f}s  ratio {l / e:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
