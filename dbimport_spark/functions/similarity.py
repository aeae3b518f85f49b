"""Approximate nearest-neighbor search over embedding columns.

Baseline: brute-force cosine (plans/vector_queries.py — broadcast matrix +
numpy block matmul). Scale path here: random-hyperplane LSH — a sign
bucket per vector turns top-k search into per-bucket candidate scans
(with 1-bit multiprobe to recover near-boundary neighbors).

Hyperplanes are DETERMINISTIC pseudo-random (sha256-seeded), reproducible
across runs without a stored model. Bucketing runs as an Arrow-batched
pandas UDF (one matmul per batch); candidate re-ranking uses exact cosine.

Plane count trades recall vs candidate volume: 2^planes buckets should be
~n/64 so buckets hold ~64 vectors (`auto_planes`). At 10^9 vectors that's
24 planes; at test scale 2-4.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hyperplanes(planes: int, dim: int, table: int = 0) -> np.ndarray:
    """Deterministic (planes × dim) matrix, components in [-1, 1).
    ``table`` seeds independent plane sets for multi-table LSH."""
    out = np.empty((planes, dim))
    for j in range(planes):
        for d in range(dim):
            h = hashlib.sha256(f"hp:{table}:{j}:{d}".encode()).digest()
            out[j, d] = int.from_bytes(h[:8], "big", signed=True) / float(2**63)
    return out


def auto_planes(n: int, target_bucket: int = 64) -> int:
    return max(2, int(math.log2(max(n / target_bucket, 4))))


def with_lsh_bucket(
    df: DataFrame, vec_col: str = "v", dim: int = 64, planes: int = 16
) -> DataFrame:
    """Attach the sign-bucket id: bit j = (v · hyperplane_j) >= 0.
    Vectorized: one numpy matmul per Arrow batch."""
    H = hyperplanes(planes, dim)
    weights = 1 << np.arange(planes, dtype=np.int64)

    @F.pandas_udf("bigint")
    def bucket_udf(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy())
        bits = (mat @ H.T) >= 0
        return pd.Series((bits * weights).sum(axis=1))

    return df.withColumn("bucket", bucket_udf(F.col(vec_col)))


def with_lsh_table_buckets(
    df: DataFrame,
    vec_col: str = "v",
    dim: int = 64,
    planes: int = 8,
    tables: int = 4,
) -> DataFrame:
    """Attach ``buckets``: one sign-bucket id per hash TABLE (independent
    hyperplane sets), the table index packed into the high bits so a single
    bigint equi-join key covers all tables. One numpy matmul per Arrow
    batch computes all tables at once (tables·planes rows stacked)."""
    H = np.vstack([hyperplanes(planes, dim, table=t) for t in range(tables)])
    weights = 1 << np.arange(planes, dtype=np.int64)
    prefixes = np.arange(tables, dtype=np.int64) << planes

    @F.pandas_udf("array<bigint>")
    def buckets_udf(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy())
        bits = (mat @ H.T) >= 0  # n × tables·planes
        cols = [
            (bits[:, t * planes : (t + 1) * planes] * weights).sum(axis=1)
            + prefixes[t]
            for t in range(tables)
        ]
        return pd.Series(list(np.stack(cols, axis=1)))

    return df.withColumn("buckets", buckets_udf(F.col(vec_col)))


def multiprobe_table_buckets(buckets_col, planes: int):
    """Every table bucket plus its 1-bit-flip probes (flips stay within the
    low `planes` bits, so the table prefix is preserved)."""
    return F.flatten(
        F.transform(
            buckets_col,
            lambda b: F.array(
                b, *[b.bitwiseXOR(F.lit(1 << j).cast("bigint")) for j in range(planes)]
            ),
        )
    )


def multiprobe_buckets(bucket_col, planes: int):
    """The bucket plus all 1-bit-flip neighbors."""
    return F.array(
        bucket_col,
        *[bucket_col.bitwiseXOR(F.lit(1 << j).cast("bigint")) for j in range(planes)],
    )


def ivf_centroids(corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int):
    """Deterministic IVF codebook: the n_centroids lowest-id vectors,
    L2-normalized (a seeded k-means would also work; fixed-id selection
    keeps the codebook reproducible with zero training passes — at scale
    the codebook is tiny driver state either way)."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    mat = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def with_ivf_cells(df: DataFrame, centroids: np.ndarray, vec_col: str, nprobe: int) -> DataFrame:
    """Attach `cells`: the nprobe nearest centroid ids by cosine (one numpy
    matmul per Arrow batch against the broadcast codebook)."""
    C = centroids

    @F.pandas_udf("array<int>")
    def cells_udf(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ C.T
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype(np.int32)))

    return df.withColumn("cells", cells_udf(F.col(vec_col)))


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single nearest
    cell; queries probe their nprobe nearest cells; exact-cosine re-rank of
    the probed candidates.

    Scale: the inverted file is ONE int cell id per vector (a narrow
    shuffle key); query fan-out is nprobe cells of ~n/n_centroids vectors
    instead of the whole corpus — the classic IVF-flat trade
    (recall grows with nprobe, cost with nprobe/n_centroids).
    """
    from pyspark.sql import Window

    from dbimport_spark.plans.vector_queries import cosine

    C = ivf_centroids(corpus, id_col, vec_col, n_centroids)
    c = (
        with_ivf_cells(corpus, C, vec_col, nprobe=1)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nv"),
            F.element_at("cells", 1).alias("cell"),
        )
    )
    q = (
        with_ivf_cells(queries, C, vec_col, nprobe=nprobe)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode("cells").alias("cell"),
        )
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("s", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("s", 6).alias("cos_sim"))
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int | None = None,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
    corpus_count: int | None = None,
) -> DataFrame:
    """Approximate top-k per query via MULTI-TABLE random-hyperplane LSH:
    candidates = corpus vectors sharing any table bucket with the query's
    multiprobe set; exact-cosine re-rank, candidates deduped per
    (query, neighbor) before ranking. Returns
    (query_id, neighbor_id, rnk, cos_sim).

    Scale: the corpus is bucketed once into `tables` independent tables
    (corpus rows replicated `tables`× on a narrow bigint key — the classic
    LSH memory-for-recall trade); each query scans
    tables·(planes+1) buckets of ~target_bucket vectors instead of the
    whole corpus. Recall at a given cost is tuned by (tables, planes):
    more tables → higher recall, more planes → smaller buckets.
    """
    from pyspark.sql import Window

    from dbimport_spark.plans.vector_queries import cosine

    if planes is None:
        n = corpus_count if corpus_count is not None else corpus.count()
        planes = auto_planes(n)
    c = with_lsh_table_buckets(corpus, vec_col, dim, planes, tables).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.explode("buckets").alias("bucket"),
    )
    q = with_lsh_table_buckets(queries, vec_col, dim, planes, tables).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            F.array_distinct(multiprobe_table_buckets(F.col("buckets"), planes))
        ).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a pair can meet in several tables/probes — dedup before ranking
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("qv").alias("qv"), F.first("nv").alias("nv"))
        .withColumn("s", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("s", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------- product quantization


def pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    train_n: int = 256,
    iters: int = 10,
) -> np.ndarray:
    """Train per-subspace PQ codebooks: (m, n_codes, dim/m).

    Deterministic Lloyd's k-means per subspace on the ``train_n`` lowest-id
    vectors (L2-normalized for cosine), initialized from the first n_codes
    sample rows — reproducible across runs with no stored model, same
    philosophy as ivf_centroids. Driver state is bounded (train_n × dim
    floats + the m·n_codes·dim/m codebook, a few KB) regardless of corpus
    size; at 100 TB you train on the same fixed sample and broadcast."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(train_n).collect()
    X = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    dsub = dim // m
    books = []
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        C = sub[:n_codes].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(n_codes):
                pts = sub[assign == j]
                if len(pts):
                    C[j] = pts.mean(axis=0)
        books.append(C)
    return np.stack(books)


def with_pq_codes(df: DataFrame, books: np.ndarray, vec_col: str = "v") -> DataFrame:
    """Attach ``codes``: the per-subspace nearest-codeword indices
    (array<int>, m entries — the 8-byte compressed form of a 512-byte
    vector). One numpy pass per Arrow batch against the broadcast books."""
    m, n_codes, dsub = books.shape
    B = books

    @F.pandas_udf("array<int>")
    def codes_udf(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        out = np.empty((len(mat), m), dtype=np.int32)
        for s in range(m):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2 → argmin over codewords
            d2 = -2.0 * (sub @ B[s].T) + (B[s] ** 2).sum(axis=1)[None, :]
            out[:, s] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return df.withColumn("codes", codes_udf(F.col(vec_col)))


def with_pq_luts(df: DataFrame, books: np.ndarray, vec_col: str = "v") -> DataFrame:
    """Attach ``lut``: the flattened (m·n_codes) asymmetric-distance table
    — lut[s·n_codes + j] = q_sub(s) · codeword_j — so the estimated cosine
    of a corpus vector is a pure-expression sum of m array lookups."""
    m, n_codes, dsub = books.shape
    B = books

    @F.pandas_udf("array<double>")
    def lut_udf(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        luts = np.empty((len(mat), m * n_codes))
        for s in range(m):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            luts[:, s * n_codes : (s + 1) * n_codes] = sub @ B[s].T
        return pd.Series(list(luts))

    return df.withColumn("lut", lut_udf(F.col(vec_col)))


def ann_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 16,
    n_codes: int = 16,
    rerank: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """PQ approximate top-k: scan the COMPRESSED corpus (m small ints per
    vector) scoring each query by LUT lookups, keep the top rerank·k ADC
    candidates per query, then exact-cosine re-rank only those.

    Scale design: the full-corpus pass touches codes only (64× smaller
    than raw vectors — the scan PQ exists for); scoring is a JVM-side
    expression (transform + aggregate over the broadcast query LUTs), no
    per-row Python. The expensive exact cosine runs on rerank·k rows per
    query via a narrow id-join back to the raw vectors."""
    from pyspark.sql import Window

    from dbimport_spark.plans.vector_queries import cosine

    books = pq_codebooks(corpus, id_col, vec_col, dim, m=m, n_codes=n_codes)
    coded = with_pq_codes(corpus, books, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    q = with_pq_luts(queries, books, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "lut"
    )
    est = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at(
                F.col("lut"), (s * n_codes + c + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("est").desc(), F.col("neighbor_id"))
    cand = (
        coded.join(F.broadcast(q.select("query_id", "lut")), how="cross")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("est", est)
        .withColumn("crnk", F.row_number().over(w))
        .filter(F.col("crnk") <= rerank * k)
        .select("query_id", "neighbor_id")
    )
    nvec = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        cand.join(nvec, "neighbor_id")
        .join(F.broadcast(q.select("query_id", "qv")), "query_id")
        .withColumn("s", cosine(F.col("qv"), F.col("nv")))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("s", 6).alias("cos_sim"))
    )
