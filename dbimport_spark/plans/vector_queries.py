"""Embedding similarity queries over the `embeddings` table (64-dim float).

Covers the similarity-search operator family for training-data pipelines:
brute-force cosine top-k (the exact baseline) and cosine near-dup pairs.
The LSH-bucketed ANN scale path lives in
dbimport_spark/functions/similarity.py (rows-only check — random
hyperplane hashes are engine-specific).

Float discipline: embeddings are cast float→double (exact) on both sides;
dot products are sequential left-folds over the same 64 doubles in both
engines, and the cosine formula is written with the same operation tree
(dot / sqrt(norm_a * norm_b)). Planted near-dups (cosine ≈ 0.999) vs
word-soup background (|cos| ≤ 0.55) keep thresholds far from any float
noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.plans.registry import load, register


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (matches DuckDB list_dot_product
    accumulation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


COSINE_SQL = "(list_dot_product({a}, {b}) / sqrt(list_dot_product({a}, {a}) * list_dot_product({b}, {b})))"

# corpus with planted near-duplicates: vec_id % 20 == 0 → copy with +0.25
# on the first component (cosine vs original ≈ 0.99+)
VEC_CORPUS_SQL = """vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         [embedding[1]::DOUBLE + 0.25] || (embedding::DOUBLE[])[2:] AS v
  FROM embeddings WHERE vec_id % 20 = 0
)"""


def vec_corpus_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    base = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    planted = (
        e.filter(F.col("vec_id") % 20 == 0)
        .select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.concat(
                F.array(F.element_at(F.col("embedding").cast("array<double>"), 1) + F.lit(0.25)),
                F.slice(F.col("embedding").cast("array<double>"), 2, 63),
            ).alias("v"),
        )
    )
    return base.unionByName(planted)


@register(
    "embedding_cosine_neardup",
    f"""WITH {VEC_CORPUS_SQL}
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round({COSINE_SQL.format(a='a.v', b='b.v')}, 6) AS cos_sim
FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
WHERE {COSINE_SQL.format(a='a.v', b='b.v')} >= 0.9""",
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.9).

    Physical plan: the normalized corpus matrix is broadcast once; each
    Spark task computes a BLOCK of the pairwise similarity matrix as a
    single numpy matmul inside mapInPandas (Arrow-batched, ~GFLOP/s per
    core) instead of a per-pair expression-tree fold, which is ~100×
    slower. Valid up to a broadcastable corpus (~1M×64 doubles = 0.5 GB);
    beyond that the LSH bucket join (functions/similarity.py) replaces the
    O(n²) pair space with per-bucket candidates.

    Threshold margin (planted ≈ 0.999 vs background ≤ 0.55) and round(6)
    make the comparison insensitive to summation-order float noise between
    numpy and the oracle's sequential fold.
    """
    import numpy as np
    import pandas as pd

    vecs = vec_corpus_df(spark, sf_dir)
    pdf = vecs.toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.vstack(pdf["v"].to_numpy())
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, matn))
    n = len(ids)

    def block(batches):
        b_ids, b_mat = bc.value
        for batch in batches:
            idx = batch["i"].to_numpy()
            sims = b_mat[idx] @ b_mat.T  # |block| × n
            rows = []
            for r, i in enumerate(idx):
                mask = (sims[r] >= 0.9) & (b_ids > b_ids[i])
                for j in np.nonzero(mask)[0]:
                    rows.append((int(b_ids[i]), int(b_ids[j]), round(float(sims[r, j]), 6)))
            yield pd.DataFrame(rows, columns=["a_id", "b_id", "cos_sim"])

    parts = max(2, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    return (
        spark.range(0, n, 1, parts)
        .select(F.col("id").cast("int").alias("i"))
        .mapInPandas(block, "a_id bigint, b_id bigint, cos_sim double")
    )


@register(
    "ann_topk_cosine",
    f"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
n AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         {COSINE_SQL.format(a='qv', b='nv')} AS s
  FROM q JOIN n ON query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rnk
  FROM scored)
SELECT query_id, neighbor_id, rnk, round(s, 6) AS cos_sim
FROM ranked WHERE rnk <= 5""",
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (k=5) for 8 query vectors — the exact ANN
    baseline: broadcast the tiny query set, one pass over the corpus, per-query
    top-k via window (bounded per-group sort)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("qv")
    )
    n = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").cast("array<double>").alias("nv")
    )
    scored = (
        n.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("s", cosine(F.col("qv"), F.col("nv")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "rnk", F.round("s", 6).alias("cos_sim"))
    )
