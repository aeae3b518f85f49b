"""Plan audit: print a one-line physical-plan summary per headline query.

Makes the ".explain and iterate" loop repeatable evidence: for every
bench-headline query, count broadcast vs sort-merge joins and
hash-partitioning exchanges, and check that some parquet scan carries
pushed filters. Run it after changing any plan:

    python tools/explain_audit.py [sf_dir]

Counts come from the pre-execution physical plan (AQE's initial plan), so
the audit is fast — nothing executes. At runtime AQE may further convert
sort-merge joins to broadcast; the static counts are the conservative
view.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    from bench import HEADLINE
    from dbimport_spark.plans import QUERIES

    from dbimport_spark import recommended_confs

    builder = (
        SparkSession.builder.master("local[8]")
        .appName("dbimport_spark_plan_audit")
        .config("spark.ui.enabled", "false")
    )
    for k, v in recommended_confs(shuffle_partitions=8).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    print(
        f"{'query':34s} {'bhj':>3s} {'smj':>3s} {'exch':>4s} {'imts':>4s} {'pushdown':>8s}"
    )
    for name in HEADLINE:
        try:
            plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming-only entries have no batch plan
            print(f"{name:34s} plan-error: {type(e).__name__}")
            continue
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        ex = plan.count("Exchange hashpartitioning")
        # InMemoryTableScan reads a materialized cache: iterative queries
        # (connected components, label propagation) legitimately show huge
        # bhj/smj counts because InMemoryRelation PRINTS its whole cached
        # lineage — the runtime reads the cache, not those joins. A
        # non-zero imts says "discount the join counts; audit the
        # per-round operator instead".
        imts = plan.count("InMemoryTableScan")
        pushed = "yes" if ("PushedFilters: [" in plan and "PushedFilters: []" not in plan) else "-"
        print(f"{name:34s} {bhj:3d} {smj:3d} {ex:4d} {imts:4d} {pushed:>8s}")


if __name__ == "__main__":
    main()
