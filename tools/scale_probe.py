"""Scale-stress probe: run the scale-path queries on K× inflated inputs.

The correctness gate runs at sf0.01 and bench at sf0.1; this tool answers
the 100-TB question empirically at the largest scale this box can hold:
inflate the driving tables K× (default 10 — i.e. sf1-equivalent row
counts), run each probed query end-to-end, and report the per-query
time ratio vs the sf0.1 bench run. A plan that survives scale shows a
ratio near the data ratio (linear scan/agg/bucket-join shapes); a plan
with a hidden quadratic or a per-group buffer blows past it.

Inflation keeps value distributions intact and shifts ids per replica
(doc_id/vec_id + i*OFFSET, orderkey + i*OFFSET) so planted-dup arithmetic
(doc_id % / + patterns) generates proportionally more work, not
degenerate all-equal storms. Document text is additionally perturbed per
replica (every 5th word gets a replica suffix — ~80% of unigram mass
kept, ~60% of trigram shingles broken, so cross-replica Jaccard lands
far below dedup thresholds): without this, K verbatim copies of every
doc make each near-dup PAIR query's output grow ~K² — a corpus property,
not a plan property — which is what a first probe run measured
(sparse_tfidf 46× at K=10; 12× after the perturbation). Embeddings get
per-replica deterministic jitter for the same reason. Tables a probe
never touches are symlinked.

Usage: python tools/scale_probe.py [factor] [query ...]
Prints one JSON line: {"factor": K, "queries": {name: sec}, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PROBES = [
    "q1_pricing_summary",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_bloom_static",
    "sparse_tfidf_neardup",
    "dup_span_coverage",
    "heavy_hitters_shingles",
    "text_lm_score",
    "text_bpe_tokens",
    "sample_dsir",
    "embedding_kmeans",
    "numeric_profile",
    "approx_quantile_gate",
    "multimodal_png_roundtrip",
    "ann_lsh_topk",
    "merge_upsert",
    "dedup_ngram_jaccard",
    "dedup_fuzzy_keys",
    "zorder_cluster",
    "quality_label_prop",
    "sample_cluster_split",
    # round 8
    "stream_lake_cdc_dv",
    "lake_delete_dv_pruned",
    "lake_rename_drop_column",
    "lake_merge_into_clauses",
    "stream_lake_apply_changes",
    "export_train_shuffle",
    "pipeline_gdpr_forget",
]

ID_OFFSET = 100_000_000


def inflate(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    def times(df, id_cols):
        parts = []
        for i in range(factor):
            p = df
            for c in id_cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * ID_OFFSET))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def times_docs(df):
        parts = []
        for i in range(factor):
            p = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * ID_OFFSET))
            if i > 0:
                p = p.withColumn(
                    "text",
                    F.expr(
                        f"array_join(transform(split(text, ' '), (w, j) -> "
                        f"CASE WHEN j % 5 = 4 THEN concat(w, 'r{i}') ELSE w END), ' ')"
                    ),
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def times_vecs(df):
        parts = []
        for i in range(factor):
            p = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * ID_OFFSET))
            if i > 0:
                p = p.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, j) -> "
                        f"x + CAST((({i} * 37 + j * 11) % 13 - 6) AS FLOAT) * 0.005f)"
                    ),
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    r = spark.read
    write(times_docs(r.parquet(f"{BASE}/documents.parquet")), "documents")
    write(times_vecs(r.parquet(f"{BASE}/embeddings.parquet")), "embeddings")
    write(
        times(r.parquet(f"{BASE}/lineitem.parquet"), ["l_orderkey"]), "lineitem"
    )
    write(times(r.parquet(f"{BASE}/orders.parquet"), ["o_orderkey"]), "orders")

    def times_customer(df):
        # Perturb c_name per replica (same reason as the document-text
        # perturbation above): K verbatim name copies put every name in a
        # K-sized edit-distance-0 clique, so fuzzy-key PAIR output grows
        # ~K² — a corpus property that measured as a fake 18× at K=10.
        # The replica suffix must differ from every OTHER replica's suffix
        # in ≥2 positions or cross-replica pairs stay within the ≤1
        # threshold (an earlier f"x{i:02d}" suffix made replica 1 vs 2
        # "x01"/"x02" — distance 1! — which quadratically inflated the
        # TRUE output and read as a fake 24× plan regression). A doubled
        # distinct letter ("bb", "cc", …) guarantees pairwise distance 2.
        parts = []
        for i in range(factor):
            p = df.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * ID_OFFSET))
            if i > 0:
                ch = chr(97 + i)  # 'b', 'c', ... distinct per replica
                p = p.withColumn("c_name", F.concat(F.col("c_name"), F.lit(ch * 2)))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    write(times_customer(r.parquet(f"{BASE}/customer.parquet")), "customer")
    # events: inflate ids AND user keys so streaming state cardinality
    # grows with the data (r6 — the streaming twins' 100× evidence);
    # timestamps stay put, so watermark windows keep their shape and
    # only the per-window row count scales. Spark rewrites the
    # TIMESTAMP(NANOS) source as micros; load_events handles both.
    # coalesce(4): read_events_stream batches per FILE (watermark
    # lifecycle semantics), so file count = micro-batch count; the scale
    # question is data-per-batch growth, not 100 batches × state-commit
    # overhead (the sf0.1 baseline is 1 file = 1 batch)
    write(
        times(r.parquet(f"{BASE}/events.parquet"), ["event_id", "user_id"]).coalesce(4),
        "events",
    )
    for t in ("region", "nation", "supplier", "part"):
        dst = f"{out_dir}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst) if not os.path.isdir(dst) else shutil.rmtree(dst)
        os.symlink(f"{BASE}/{t}.parquet", dst)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    subset = sys.argv[2:] or PROBES

    from pyspark.sql import SparkSession

    from dbimport_spark.plans import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    # Shuffle partitions scale WITH the data (the brief's sizing rule:
    # partitions must fit executor memory at the target SF) — keeping them
    # pinned at |cores| while inflating K× makes every partition K× larger
    # and measures spill, not plan shape. AQE coalesces the excess when a
    # stage is small, so oversizing is cheap.
    # SPARK_GRAFT_SHUFFLE overrides for STATEFUL probes: streaming state
    # stores cost O(partitions) per micro-batch regardless of rows, so
    # the scale-with-data default (right for joins/aggs, where it
    # measures plan shape instead of spill) turns a single-box streaming
    # probe into pure task/state-instance overhead — 1600 partitions ×
    # per-batch state commit. A real cluster amortizes partitions across
    # executors; one box should probe state queries at ~4× cores.
    shuffle_parts = int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", int(cpus) * max(1, factor // 2))
    )
    from dbimport_spark import recommended_confs

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dbimport_spark_scale_probe")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in recommended_confs(shuffle_partitions=shuffle_parts).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        tempfile.gettempdir(), f"dbimport_spark_scale/x{factor}"
    )
    marker = os.path.join(out_dir, "_built")
    if not os.path.exists(marker):
        inflate(spark, factor, out_dir)
        open(marker, "w").close()

    timings: dict[str, float] = {}
    for name in subset:
        t0 = time.time()
        QUERIES[name](spark, out_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scale_probe_runtime",
                "factor": factor,
                "base": BASE,
                "unit": "sec",
                "queries": timings,
                "value": round(sum(timings.values()), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
