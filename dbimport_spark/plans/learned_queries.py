"""Learned / iterative operators with exact integer oracles.

Two operator families a training-data pipeline needs beyond fixed
transforms: a LEARNED scorer (train a model on the corpus, score every
row — here multinomial Naive Bayes for language/quality routing, the
linear-classifier stage of C4/CCNet-style curation) and an ITERATIVE
graph computation (PageRank — importance propagation over a relationship
graph, the shape of both web-graph quality weighting and
citation/link-based sampling).

Determinism discipline (what makes these ORACLE-checkable where most
"ML in SQL" is not): every transcendental is computed ONCE per model
parameter and immediately quantized to a fixed-point BIGINT
(``round(1e6 * ln(p))``); all per-row scoring and all PageRank iteration
arithmetic is then EXACT integer math (sums, products, integer division),
so Spark and DuckDB agree bit-for-bit regardless of accumulation order.
Float risk is confined to ~200 one-time roundings whose inputs are exact
integer ratios — a >1e-9-wide rounding margin per value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.plans.registry import load, register

_TOKEN_RE = "[a-z]+"
_S = 1_000_000  # fixed-point scale for log-probabilities


def nb_model(docs: DataFrame):
    """Train multinomial NB with Laplace smoothing on the hash-split
    training slice (doc_id % 5 != 0), labels = lang.

    Returns (lp, lang_stats) where lp is the (token, lang, lp) quantized
    log-likelihood table and lang_stats is (lang, lp0, prior) with the
    unseen-token log-prob and the class log-prior. Both are
    vocab/class-sized — broadcast tables at any corpus scale; training is
    two hash aggregations over the token stream (one shuffle each)."""
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    train_tok = tok.filter(F.col("doc_id") % 5 != 0)
    # cnt is the ONLY aggregate that touches the token stream; it is
    # vocab×classes-sized, and every other model table derives from it.
    # Persist it or the corpus explode re-runs once per downstream
    # broadcast (~8 recomputations — measured 116 s vs 17 s at the 10×
    # probe scale).
    cnt = (
        train_tok.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    n_lang = cnt.groupBy("lang").agg(F.sum("cnt").cast("bigint").alias("n_lang"))
    vocab = cnt.agg(F.count_distinct("token").alias("v"))
    train_docs = docs.filter(F.col("doc_id") % 5 != 0)
    n_train = train_docs.agg(F.count(F.lit(1)).alias("n_docs"))
    prior = (
        train_docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(n_train))
        .select(
            "lang",
            F.round(
                F.lit(_S) * F.log(F.col("c").cast("double") / F.col("n_docs"))
            )
            .cast("bigint")
            .alias("prior"),
        )
    )
    denom = F.col("n_lang") + F.col("v")
    lang_stats = (
        n_lang.crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            F.round(F.lit(_S) * F.log(F.lit(1.0) / denom)).cast("bigint").alias("lp0"),
        )
        .join(F.broadcast(prior), "lang")
    )
    lp = (
        cnt.join(F.broadcast(n_lang), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "token",
            "lang",
            F.round(F.lit(_S) * F.log((F.col("cnt") + 1).cast("double") / denom))
            .cast("bigint")
            .alias("lp"),
        )
    )
    return lp, lang_stats


def nb_score(docs: DataFrame, lp: DataFrame, lang_stats: DataFrame) -> DataFrame:
    """Score every document against every class and pick the argmax
    (ties broken by lexicographically smallest lang — encoded as
    min(struct(-score, lang)) so one hash agg does both).

    Per-row cost: one explode + two BROADCAST joins + two hash aggs keyed
    on doc_id — no shuffle touches the corpus except the doc_id agg, and
    that key is unique per document (no skew)."""
    doc_tok = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(_TOKEN_RE), F.lit(0)
                )
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tok_sum = (
        doc_tok.crossJoin(F.broadcast(lang_stats.select("lang", "lp0")))
        .join(F.broadcast(lp), ["token", "lang"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("n") * F.coalesce(F.col("lp"), F.col("lp0"))).alias("ts")
        )
    )
    scored = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(lang_stats.select("lang", "prior")))
        .join(tok_sum, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "lang",
            (F.col("prior") + F.coalesce(F.col("ts"), F.lit(0))).alias("score"),
        )
    )
    best = scored.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("lang").alias("pl"))).alias(
            "b"
        )
    )
    return best.select(
        "doc_id",
        F.col("b.pl").alias("pred_lang"),
        (-F.col("b.ns")).cast("bigint").alias("pred_score"),
    )


_NB_ORACLE = f"""WITH tok AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS token
  FROM documents
), train_tok AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
  FROM tok WHERE doc_id % 5 <> 0 GROUP BY lang, token
), n_lang AS (
  SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_lang FROM train_tok GROUP BY lang
), vocab AS (
  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
  FROM tok WHERE doc_id % 5 <> 0
), n_train AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents WHERE doc_id % 5 <> 0
), prior AS (
  SELECT lang,
         CAST(round({_S} * ln(CAST(count(*) AS DOUBLE) / n_docs)) AS BIGINT)
           AS prior
  FROM documents CROSS JOIN n_train
  WHERE doc_id % 5 <> 0 GROUP BY lang, n_docs
), lang_stats AS (
  SELECT lang,
         CAST(round({_S} * ln(1.0 / (n_lang + v))) AS BIGINT) AS lp0,
         prior
  FROM n_lang CROSS JOIN vocab JOIN prior USING (lang)
), lp AS (
  SELECT token, lang,
         CAST(round({_S} * ln(CAST(cnt + 1 AS DOUBLE) / (n_lang + v))) AS BIGINT)
           AS lp
  FROM train_tok JOIN n_lang USING (lang) CROSS JOIN vocab
), doc_tok AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS n
  FROM tok GROUP BY doc_id, token
), tok_sum AS (
  SELECT dt.doc_id, ls.lang,
         CAST(sum(dt.n * COALESCE(lp.lp, ls.lp0)) AS BIGINT) AS ts
  FROM doc_tok dt
  CROSS JOIN lang_stats ls
  LEFT JOIN lp ON lp.token = dt.token AND lp.lang = ls.lang
  GROUP BY dt.doc_id, ls.lang
), scored AS (
  SELECT d.doc_id, ls.lang, ls.prior + COALESCE(t.ts, 0) AS score
  FROM documents d
  CROSS JOIN lang_stats ls
  LEFT JOIN tok_sum t ON t.doc_id = d.doc_id AND t.lang = ls.lang
), ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC)
           AS rn
  FROM scored
)
SELECT doc_id, lang AS pred_lang, CAST(score AS BIGINT) AS pred_score
FROM ranked WHERE rn = 1"""


@register("quality_nb_classifier", _NB_ORACLE)
def quality_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive-Bayes language router: train on the 80%
    hash-split slice, score EVERY document, emit the argmax class — the
    fastText-linear-classifier stage of a C4/CCNet-style curation
    pipeline, expressed as pure aggregations.

    100-TB shape: training is two token-stream hash aggs (the model is
    vocab×classes ≈ KBs); scoring joins only BROADCAST tables and
    aggregates on the unique doc_id key. Nothing quadratic, no driver
    collect, no Python UDF. All scoring math is fixed-point integer (see
    module docstring), so the oracle match is exact."""
    docs = load(spark, sf_dir, "documents")
    lp, lang_stats = nb_model(docs)
    return nb_score(docs, lp, lang_stats)


_PR_SCALE = 1_000_000_000
_PR_ITERS = 5


def _pagerank_iter_sql() -> str:
    """Unrolled r0..rN CTE chain of the fixed-point PageRank oracle."""
    parts = []
    for i in range(1, _PR_ITERS + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT e.dst AS node,
         CAST({15 * _PR_SCALE} // (100 * nn.n)
              + sum((85 * r.r) // (100 * d.outdeg)) AS BIGINT) AS r
  FROM edges e
  JOIN r{i - 1} r ON e.src = r.node
  JOIN deg d ON d.src = e.src
  CROSS JOIN nn
  GROUP BY e.dst, nn.n
)"""
        )
    return ",\n".join(parts)


_PR_ORACLE = f"""WITH edges0 AS MATERIALIZED (
  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
), edges AS MATERIALIZED (
  SELECT src, dst FROM edges0 UNION ALL SELECT dst AS src, src AS dst FROM edges0
), deg AS MATERIALIZED (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
), nodes AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM edges
), nn AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
), r0 AS MATERIALIZED (
  SELECT node, CAST({_PR_SCALE} // n AS BIGINT) AS r FROM nodes CROSS JOIN nn
),
{_pagerank_iter_sql()}
SELECT node, r AS pr FROM r{_PR_ITERS}"""


@register("graph_pagerank", _PR_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d = 0.85, 5 synchronous iterations) over the
    part–supplier co-occurrence graph mined from lineitem — the
    link-importance primitive behind web-graph quality weighting of a
    crawl corpus. Nodes are parts (2k) and suppliers (2k+1); every
    distinct (part, supplier) lineitem pair is an undirected edge.

    Iteration arithmetic is fixed-point integer (rank units of 1e-9):
    r_next(v) = (15·S) div (100·N) + Σ_incoming (85·r_u) div (100·deg_u)
    — exact on both engines, no float accumulation anywhere.

    100-TB shape: each iteration is one equi-join of the edge list with
    the rank vector on src plus one hash agg on dst — the textbook
    distributed PageRank round (functions/graph.py, which also provides
    localCheckpoint lineage truncation for high iteration counts — not
    needed at 5 rounds). The edge list is deduplicated once and
    persisted; degree rides along the edge row so iterations never touch
    a second table. The driver loop is 5 plan-building steps (no
    data on the driver); diameter-bounded iteration counts replace
    convergence polling, matching the connected-components design in
    functions/cluster.py."""
    from dbimport_spark.functions.graph import pagerank

    l = load(spark, sf_dir, "lineitem")
    e0 = l.select(
        (F.col("l_partkey") * 2).alias("src"), (F.col("l_suppkey") * 2 + 1).alias("dst")
    ).distinct()
    edges = e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(edges, iters=_PR_ITERS)


def _register_stream_nb():
    """Streaming twin: score a document STREAM against the NB model
    trained on the static corpus — continuous-ingest language routing.
    Same output as the batch query, so it shares its oracle verbatim."""
    from dbimport_spark.plans.registry import ORACLES

    @register("stream_nb_score", ORACLES["quality_nb_classifier"])
    def stream_nb_score(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Structured Streaming allows only ONE stateful aggregation per
        query, so the batch plan's agg→join→agg argmax is re-shaped: the
        class axis is PIVOTED into columns (the model's class set is tiny
        and known once trained), giving explode → broadcast join → one
        groupBy(doc_id) with K sum columns → stateless argmax over
        columns. Semantically identical to nb_score; per-doc state is K
        integers."""
        from dbimport_spark.plans.streaming_queries import _docs_path, _run_to_memory

        static = load(spark, sf_dir, "documents")
        lp, lang_stats = nb_model(static)
        stats = sorted(
            (r["lang"], r["lp0"], r["prior"]) for r in lang_stats.collect()
        )
        langs = [s[0] for s in stats]
        lp_wide = (
            lp.groupBy("token")
            .pivot("lang", langs)
            .agg(F.first("lp"))
            .toDF("token", *[f"lp_{la}" for la in langs])
        )
        sch = static.schema
        stream = spark.readStream.schema(sch).parquet(_docs_path(sf_dir))
        tok = stream.select(
            "doc_id",
            F.explode_outer(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(_TOKEN_RE), F.lit(0)
                )
            ).alias("token"),
        ).join(F.broadcast(lp_wide), "token", "left")
        sums = tok.groupBy("doc_id").agg(
            *[
                F.sum(
                    F.when(F.col("token").isNull(), F.lit(0)).otherwise(
                        F.coalesce(F.col(f"lp_{la}"), F.lit(lp0))
                    )
                ).alias(f"s_{la}")
                for la, lp0, _ in stats
            ]
        )
        score_cols = [
            (F.col(f"s_{la}") + F.lit(prior)).alias(f"score_{la}")
            for la, _, prior in stats
        ]
        scored = sums.select("doc_id", *score_cols)
        best = F.greatest(*[F.col(f"score_{la}") for la in langs])
        pred = F.coalesce(
            *[
                F.when(F.col(f"score_{la}") == best, F.lit(la))
                for la in langs
            ]
        )
        out = scored.select(
            "doc_id",
            pred.alias("pred_lang"),
            best.cast("bigint").alias("pred_score"),
        )
        return _run_to_memory(out, spark, output_mode="complete", src=sf_dir)


_register_stream_nb()


_TRI_ORACLE = """WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS MATERIALIZED (
  SELECT DISTINCT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
), tri AS MATERIALIZED (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), pts AS (
  SELECT u AS node FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM pts GROUP BY node"""


@register("graph_triangle_count", _TRI_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the part co-occurrence graph (parts
    that appear in the same order are connected) — the local-clustering
    primitive behind community detection, link-spam demotion, and
    kNN-graph coherence checks on a crawl corpus.

    Graph construction is itself distributed and avoids the obvious
    self-join: ONE shuffle groups each order's parts into a sorted
    distinct array, and an in-task HOF expands the k·(k-1)/2 pairs
    (baskets are small — TPC-H orders hold ≤ 7 parts; a power-law
    basket distribution would cap the array with slice() before
    expanding, the standard market-basket guard). Counting is
    functions/graph.py triangle_counts — DEGREE-ORIENTED wedge join +
    packed-long-key closure semi-join, the O(m^1.5)-bounded plan that
    survives power-law degree skew at 100 TB; the DuckDB oracle counts
    the same triangles by the natural a < b orientation, which provably
    enumerates the same set (each triangle once), so per-node counts
    match exactly."""
    from dbimport_spark.functions.graph import triangle_counts

    l = load(spark, sf_dir, "lineitem")
    grouped = (
        l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.array_sort(F.array_distinct(F.collect_list("p"))).alias("ps"))
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> transform("
                "slice(ps, i + 2, size(ps) - i - 1), y -> struct(x as src, y as dst))))"
            )
        ).alias("pr")
    ).select("pr.src", "pr.dst")
    return triangle_counts(pairs)


_KCORE_K = 75
_KCORE_ROUNDS = 3


def _kcore_round_sql() -> str:
    parts = []
    for i in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, count(*) AS c
  FROM (SELECT a AS node FROM e{i - 1} UNION ALL SELECT b FROM e{i - 1})
  GROUP BY node
), k{i} AS MATERIALIZED (
  SELECT node FROM d{i} WHERE c >= {_KCORE_K}
), e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i - 1} e
  JOIN k{i} x ON e.a = x.node
  JOIN k{i} y ON e.b = y.node
)"""
        )
    return ",\n".join(parts)


_KCORE_ORACLE = f"""WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e0 AS MATERIALIZED (
  SELECT DISTINCT a.p AS a, b.p AS b FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
),
{_kcore_round_sql()}
SELECT node, CAST(count(*) AS BIGINT) AS deg
FROM (SELECT a AS node FROM e{_KCORE_ROUNDS} UNION ALL SELECT b FROM e{_KCORE_ROUNDS})
GROUP BY node"""


@register("graph_kcore", _KCORE_ORACLE)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KCORE_ROUNDS} peeling rounds toward the {_KCORE_K}-core of the
    part co-occurrence graph — the dense-subgraph extractor behind spam
    cluster mining, community nuclei, and graph sparsification before
    expensive per-node work (run the costly operator only inside the
    core). Same graph as graph_triangle_count; functions/graph.py
    kcore_peel does one degree hash-agg + two survivor semi-joins per
    round — survivor sets are runtime agg outputs that AQE broadcasts
    when small, and each round's edge list persists exactly one
    generation. The oracle unrolls the identical three rounds as CTEs
    (the pagerank unrolling discipline), so the surviving (node, degree)
    table matches exactly."""
    from dbimport_spark.functions.graph import kcore_peel

    l = load(spark, sf_dir, "lineitem")
    grouped = (
        l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.array_sort(F.array_distinct(F.collect_list("p"))).alias("ps"))
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> transform("
                "slice(ps, i + 2, size(ps) - i - 1), y -> struct(x as src, y as dst))))"
            )
        ).alias("pr")
    ).select("pr.src", "pr.dst")
    return kcore_peel(pairs, k=_KCORE_K, rounds=_KCORE_ROUNDS)


_CC_SCALE = 1_000_000


_CCOEFF_ORACLE = f"""WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS MATERIALIZED (
  SELECT DISTINCT a.p AS a, b.p AS b FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
), tri AS MATERIALIZED (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), nt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_tri
  FROM (SELECT u AS node FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
  GROUP BY node
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY node
)
SELECT d.node, d.deg, COALESCE(nt.n_tri, 0) AS n_tri,
       CAST((2 * {_CC_SCALE} * COALESCE(nt.n_tri, 0)) // (d.deg * (d.deg - 1)) AS BIGINT)
         AS coeff_micro
FROM deg d LEFT JOIN nt USING (node)
WHERE d.deg >= 2"""


@register("graph_clustering_coeff", _CCOEFF_ORACLE)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — 2·triangles(v) scaled by
    deg(v)·(deg(v)−1) in exact integer micros — the per-node community
    cohesion signal (spam farms score near 1e6, hub pages near 0) that
    composes directly from triangle_counts(include_degrees=True): the
    degree table built for the orientation is reused, so the only cost
    beyond the triangle pipeline is one left join and a div. Integer
    floor-division both sides — no float anywhere."""
    from dbimport_spark.functions.graph import triangle_counts

    l = load(spark, sf_dir, "lineitem")
    grouped = (
        l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.array_sort(F.array_distinct(F.collect_list("p"))).alias("ps"))
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> transform("
                "slice(ps, i + 2, size(ps) - i - 1), y -> struct(x as src, y as dst))))"
            )
        ).alias("pr")
    ).select("pr.src", "pr.dst")
    nd = triangle_counts(pairs, include_degrees=True)
    return nd.filter(F.col("deg") >= 2).select(
        "node",
        "deg",
        "n_tri",
        F.expr(f"cast((2 * {_CC_SCALE} * n_tri) div (deg * (deg - 1)) as bigint)").alias(
            "coeff_micro"
        ),
    )
