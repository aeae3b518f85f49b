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
def embedding_cosine_neardup(
    spark: SparkSession, sf_dir: str, num_blocks: int = 8
) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.9), fully distributed.

    Physical plan: distributed blocked all-pairs. Each vector is assigned
    to one of B blocks (pmod on vec_id); blocks are packed executor-side
    into one row each (collect_list aggregation — one shuffle), then the
    B·(B+1)/2 block PAIRS are formed with a self-join and each task
    computes one block-pair similarity tile as a single numpy matmul
    inside mapInPandas (Arrow-batched, ~GFLOP/s per core). Nothing is
    collected to the driver and no full-corpus broadcast exists: peak
    per-task memory is two blocks (n/B × dim doubles), tunable via
    ``num_blocks`` — at 1M×64 and B=64 that is ~8 MB/task. The pair
    SPACE is still O(n²) compute (it is an exact operator); the
    sub-quadratic scale path is the LSH bucket join in
    functions/similarity.py.

    Each unordered pair lands in exactly one block-pair tile (x.blk <=
    y.blk with id-ordering inside the tile), so no dedup pass is needed.

    Threshold margin (planted ≈ 0.999 vs background ≤ 0.55) and round(6)
    make the comparison insensitive to summation-order float noise between
    numpy and the oracle's sequential fold.
    """
    import numpy as np
    import pandas as pd

    B = num_blocks
    vecs = vec_corpus_df(spark, sf_dir).withColumn(
        "blk", F.pmod(F.col("vec_id"), F.lit(B)).cast("int")
    )
    blocks = vecs.groupBy("blk").agg(
        F.collect_list(F.struct("vec_id", "v")).alias("items")
    )
    tiles = (
        blocks.select(F.col("blk").alias("x_blk"), F.col("items").alias("x_items"))
        .join(
            blocks.select(F.col("blk").alias("y_blk"), F.col("items").alias("y_items")),
            F.col("x_blk") <= F.col("y_blk"),
        )
        .repartition(B * (B + 1) // 2)
    )

    def tile_sims(batches):
        def unpack(items):
            ids = np.fromiter((it["vec_id"] for it in items), dtype=np.int64)
            mat = np.vstack([np.asarray(it["v"], dtype=np.float64) for it in items])
            return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)

        for batch in batches:
            for _, row in batch.iterrows():
                x_ids, x_mat = unpack(row["x_items"])
                y_ids, y_mat = unpack(row["y_items"])
                sims = x_mat @ y_mat.T
                if row["x_blk"] == row["y_blk"]:
                    # same block: id-order inside the tile dedups the pair
                    ii, jj = np.nonzero(
                        (sims >= 0.9) & (x_ids[:, None] < y_ids[None, :])
                    )
                    a, b = x_ids[ii], y_ids[jj]
                else:
                    # cross block: the tile holds each pair once — keep all,
                    # order ids min/max (block order is unrelated to id order)
                    ii, jj = np.nonzero(sims >= 0.9)
                    a = np.minimum(x_ids[ii], y_ids[jj])
                    b = np.maximum(x_ids[ii], y_ids[jj])
                yield pd.DataFrame(
                    {"a_id": a, "b_id": b, "cos_sim": np.round(sims[ii, jj], 6)}
                )

    return tiles.mapInPandas(tile_sims, "a_id bigint, b_id bigint, cos_sim double")


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


@register(
    "ann_filtered_topk",
    f"""WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < 8
    AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
), n AS (
  SELECT vec_id AS neighbor_id, label, embedding::DOUBLE[] AS nv
  FROM embeddings
  WHERE label IN (2, 7)
    AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
), scored AS (
  SELECT query_id, neighbor_id, label,
         {COSINE_SQL.format(a='qv', b='nv')} AS s
  FROM q JOIN n ON query_id <> neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, label, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rnk
  FROM scored)
SELECT query_id, neighbor_id, CAST(label AS BIGINT) AS label, rnk,
       round(s, 6) AS cos_sim
FROM ranked WHERE rnk <= 5""",
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search (the hybrid-search primitive every
    RAG stack needs: "nearest neighbors WHERE label matches"): exact
    cosine top-5 for 8 query vectors over only the corpus rows whose
    label passes the predicate.

    Plan: the label filter lands in the parquet scan (PushedFilters —
    pre-filtering, not post-filtering, so selective predicates shrink
    the distance work proportionally, unlike post-filter ANN which
    can return < k rows); the tiny query set broadcasts; per-query
    top-5 is a bounded window. At 100 TB with an IVF index the same
    predicate intersects the inverted lists BEFORE the ADC scan
    (functions/similarity.py keeps centroid assignment orthogonal to
    metadata columns, so the filtered variant is the same plan with
    this WHERE pushed into the posting scan)."""
    # zero-norm vectors have no defined cosine (ANSI 0/0 errors; NaN
    # ordering is engine-dependent) — excluded on both sides, mirrored
    # in the oracle, same rule as retrieval_hybrid_rrf
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).filter(dot(F.col("v"), F.col("v")) > 0)
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    n = e.filter(F.col("label").isin(2, 7)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").cast("bigint").alias("label"),
        F.col("v").alias("nv"),
    )
    scored = n.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).withColumn(
        "s", cosine(F.col("qv"), F.col("nv"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "label", "rnk", F.round("s", 6).alias("cos_sim"))
    )
