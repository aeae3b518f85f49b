"""Per-query job/stage/task accounting via the Spark UI REST API.

For each named query: runs it end-to-end twice (bench methodology —
noop sink, best-of-2) with the UI enabled, then reads
/api/v1/applications/<id>/jobs to report how many Spark jobs the query
launched, their stage/task counts, and the aggregate job wall-clock vs
the query's wall-clock. The gap (wall - sum(job durations)) is
driver-side work: query planning, txnlog commit IO, stream machinery.

Usage: python tools/profile_jobs.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]

    from pyspark.sql import SparkSession

    from dbimport_spark import recommended_confs
    from dbimport_spark.plans import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_jobs")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "20000")
        .config("spark.ui.retainedStages", "20000")
        .config("spark.driver.memory", "16g")
    )
    for k, v in recommended_confs(shuffle_partitions=int(cpus)).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(job_floor: int) -> list[dict]:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        ) as r:
            js = json.load(r)
        return [j for j in js if j["jobId"] >= job_floor]

    def max_job_id() -> int:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs"
        ) as r:
            js = json.load(r)
        return max((j["jobId"] for j in js), default=-1)

    # warmup
    spark.range(1000).selectExpr("sum(id)").collect()

    for name in names:
        for run in range(2):
            floor = max_job_id() + 1
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
            spark.catalog.clearCache()
            time.sleep(0.3)  # let the listener bus drain
            js = jobs_after(floor)
            njobs = len(js)
            ntasks = sum(j.get("numTasks", 0) for j in js)
            nstages = sum(len(j.get("stageIds", [])) for j in js)
            jobsec = 0.0
            slow = []
            for j in js:
                try:
                    t_sub = time.strptime(
                        j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                    )
                    t_end = time.strptime(
                        j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                    )
                    dur = time.mktime(t_end) - time.mktime(t_sub)
                    # sub-second resolution from the GMT milliseconds
                    dur += (
                        int(j["completionTime"][20:23])
                        - int(j["submissionTime"][20:23])
                    ) / 1000.0
                except (KeyError, ValueError):
                    dur = 0.0
                jobsec += dur
                slow.append((dur, j["jobId"], j.get("name", "")[:60]))
            slow.sort(reverse=True)
            print(
                f"\n=== {name} run{run}: wall {wall:.2f}s  jobs={njobs} "
                f"stages={nstages} tasks={ntasks}  job-time {jobsec:.2f}s  "
                f"driver-gap {wall - jobsec:.2f}s"
            )
            for dur, jid, jname in slow[:8]:
                print(f"  {dur:6.2f}  job {jid}  {jname}")

    spark.stop()


if __name__ == "__main__":
    main()
