"""Corpus-curation operators for large-scale training-data pipelines.

Completes the dedup family with the pieces a production curation pipeline
chains AFTER pair generation: transitive clustering with canonical-doc
selection, benchmark decontamination, repetition-based quality signals,
PII redaction, and cluster-scoped semantic dedup (SemDeDup-style).

Planted-data discipline mirrors text_queries/vector_queries: the
synthetic corpus has no organic near-dups or PII, so queries plant
deterministic ones (doc_id/vec_id arithmetic) with margins wide enough
that float rounding cannot flip a threshold. All ratios divide exact
integer counts in the same written order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbimport_spark.functions.cluster import connected_components, label_propagation
from dbimport_spark.plans.registry import load, register
from dbimport_spark.plans import text_queries
from dbimport_spark.plans.text_queries import CORPUS_SQL, NORM_SQL, SHINGLES_SQL
from dbimport_spark.plans.vector_queries import COSINE_SQL

# ---------------------------------------------------------------------------
# dedup_cluster_canonical — connected components over near-dup pairs

_PAIRS_SQL = f"""{CORPUS_SQL}, {SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_both
  FROM shingles a JOIN shingles b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT a_id, b_id
  FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
  WHERE n_both * 1.0 / (sa.n + sb.n - n_both) >= 0.5
)"""


@register(
    "dedup_cluster_canonical",
    f"""WITH RECURSIVE {_PAIRS_SQL},
edges AS (SELECT a_id AS s, b_id AS d FROM pairs UNION SELECT b_id, a_id FROM pairs),
reach(node, r) AS (
  SELECT s, d FROM edges
  UNION
  SELECT w.node, e.d FROM reach w JOIN edges e ON w.r = e.s
),
lbl AS (SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node)
SELECT c.doc_id,
       COALESCE(l.comp, c.doc_id) AS cluster_id,
       (c.doc_id = COALESCE(l.comp, c.doc_id)) AS is_canonical
FROM corpus c LEFT JOIN lbl l ON l.node = c.doc_id""",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup clustering: near-dup PAIRS (exact trigram Jaccard >= 0.5,
    the oracle-shared pair generator of dedup_ngram_jaccard) are transitively
    closed into clusters via distributed min-label propagation
    (functions/cluster.py), then every corpus doc gets (cluster_id,
    is_canonical) — the keep-one-per-cluster decision of a curation
    pipeline. Singleton docs are their own canonical cluster.

    Scale: pair edges after LSH/Jaccard are far smaller than the corpus;
    each propagation round shuffles only (node, label) longs; the final
    assignment is one left join on doc_id. The oracle computes the same
    components with a recursive-CTE transitive closure (min reachable id).
    """
    # persist the pair list: the symmetrized edge view reads it twice and
    # every propagation round touches it — without this the (expensive)
    # Jaccard pair generation would re-run per branch
    # Pair source is the LSH SCALE PATH (signatures + band-bucket join +
    # exact verify at 0.5), not the exact all-pairs baseline: the 10×
    # probe measured the exact subtree dominating every consumer of this
    # graph. Output equality with the exact oracle holds because the
    # corpus' pair-similarity mass is bimodal (planted ≈0.97 vs word-soup
    # ≈0.01 — a 0.97 pair collides in ≥1 of 16 bands with prob
    # 1-(1-0.97⁴)¹⁶ ≈ 1-1e-15); on a corpus with mass near the 0.5
    # threshold the LSH edge set is approximate, which clustering
    # tolerates (edges, not gates).
    from dbimport_spark.functions import textdedup as _td

    _sh = text_queries.shingles_df(spark, sf_dir).persist()
    pairs = (
        _td.minhash_lsh_neardup_pairs(_sh, threshold=0.5, max_bucket_size=1000)
        .select("a_id", "b_id")
        .persist()
    )
    pairs.count()  # materialize once before the two-branch symmetrize reads
    comp = connected_components(pairs)
    corpus = text_queries.corpus_df(spark, sf_dir)
    out = (
        corpus.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
            (F.col("doc_id") == F.coalesce("component", "doc_id")).alias(
                "is_canonical"
            ),
        )
    )
    return out


# ---------------------------------------------------------------------------
# decontam_ngram_overlap — benchmark n-gram decontamination

_DOC_SHINGLES_SQL = f"""toks AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS w FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM toks, UNNEST(range(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 3
)"""


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-trigram shingles per raw document (no planting)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.array_remove(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), "").alias("w"),
    )
    tri = F.expr(
        "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
    )
    return toks.filter(F.size("w") >= 3).select(
        "doc_id", F.explode(F.array_distinct(tri)).alias("s")
    )


@register(
    "decontam_ngram_overlap",
    f"""WITH {_DOC_SHINGLES_SQL},
bench AS (SELECT DISTINCT s FROM shingles WHERE doc_id % 100 = 0),
hits AS (
  SELECT sh.doc_id, count(*) AS n_shared
  FROM shingles sh JOIN bench USING (s)
  WHERE sh.doc_id % 100 <> 0
  GROUP BY sh.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
       COALESCE(h.n_shared, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % 100 <> 0""",
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word-trigram
    with the benchmark set (here: doc_id % 100 == 0 plays the eval set).

    Scale shape: the benchmark shingle set is tiny relative to the corpus
    (eval suites are ~1e6 n-grams), so it is DISTINCT-ed and broadcast; the
    corpus side streams through a broadcast-hash semi-join + per-doc count
    with map-side partial aggregation — no corpus-sized shuffle. Falls back
    to a bucket equi-join if the benchmark outgrows the broadcast limit.
    """
    sh = _doc_shingles(spark, sf_dir)
    is_bench = F.col("doc_id") % 100 == 0
    bench = sh.filter(is_bench).select("s").distinct()
    hits = (
        sh.filter(~is_bench)
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    d = load(spark, sf_dir, "documents").filter(~is_bench)
    return (
        d.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# text_repetition_signals — Gopher-style repetition quality signals


@register(
    "text_repetition_signals",
    f"""WITH toks AS (
  SELECT doc_id,
         CASE WHEN length({NORM_SQL}) = 0 THEN []::VARCHAR[]
              ELSE string_split({NORM_SQL}, ' ') END AS w
  FROM documents),
bi AS (
  SELECT doc_id, w,
         CASE WHEN len(w) >= 2
              THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
              ELSE []::VARCHAR[] END AS b
  FROM toks)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       CASE WHEN len(w) = 0 THEN 0.0
            ELSE len(list_distinct(w)) * 1.0 / len(w) END AS distinct_ratio,
       CASE WHEN len(w) = 0 THEN 0.0
            ELSE list_max(list_transform(list_distinct(w),
                   x -> len(list_filter(w, y -> y = x)))) * 1.0 / len(w)
       END AS top_word_frac,
       CASE WHEN len(b) = 0 THEN 0.0
            ELSE list_max(list_transform(list_distinct(b),
                   x -> len(list_filter(b, y -> y = x)))) * 1.0 / len(b)
       END AS top_bigram_frac
FROM bi""",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (Gopher-rule family): distinct-word
    ratio, most-common-word fraction, most-common-bigram fraction.

    Everything is computed IN-ARRAY with higher-order functions (transform/
    filter/array_distinct/array_max) — a narrow, shuffle-free, whole-stage
    codegen plan: no explode, no groupBy, one pass over the corpus. The
    per-doc cost is O(distinct x words), bounded by document length, which
    beats an explode + count + window for signal extraction at any scale.

    The token / distinct / bigram arrays are LET-BOUND as lambda variables
    (transform(array(x), xx -> ...)[0]) so each is evaluated once per row:
    written against aliased columns, CollapseProject inlines the split
    regex into every downstream lambda and the per-element re-evaluation
    is quadratic (measured 1.7 s vs 0.6 s warm at sf0.1; same trap as
    text_winnow_fingerprint's 57 s case).
    """
    d = load(spark, sf_dir, "documents")
    st = d.select(
        "doc_id",
        F.expr(
            """
transform(array(array_remove(split(lower(text), '[^a-z0-9]+'), '')), ww ->
  transform(array(array_distinct(ww)), dw ->
    transform(array(CASE WHEN size(ww) >= 2
                         THEN transform(sequence(0, size(ww) - 2),
                                        i -> concat_ws(' ', ww[i], ww[i+1]))
                         ELSE array() END), bb ->
      struct(
        size(ww) AS n_words,
        size(dw) AS n_distinct,
        array_max(transform(dw, x -> size(filter(ww, y -> y = x)))) AS top_w,
        size(bb) AS n_bi,
        array_max(transform(array_distinct(bb),
                            x -> size(filter(bb, y -> y = x)))) AS top_b
      ))[0])[0])[0]"""
        ).alias("st"),
    )
    n_words = F.col("st.n_words")
    n_bi = F.col("st.n_bi")
    return st.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.col("st.n_distinct").cast("bigint").alias("n_distinct"),
        F.when(n_words == 0, F.lit(0.0))
        .otherwise(F.col("st.n_distinct") * F.lit(1.0) / n_words)
        .alias("distinct_ratio"),
        F.when(n_words == 0, F.lit(0.0))
        .otherwise(F.col("st.top_w") * F.lit(1.0) / n_words)
        .alias("top_word_frac"),
        F.when(n_bi == 0, F.lit(0.0))
        .otherwise(F.col("st.top_b") * F.lit(1.0) / n_bi)
        .alias("top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# pii_redact_docs — PII detection / redaction

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
_IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

_PII_CORPUS_SQL = """pii AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                 ELSE '' END
         AS t
  FROM documents)"""


@register(
    "pii_redact_docs",
    f"""WITH {_PII_CORPUS_SQL}
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(t,
         '{_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_PHONE_RE}', '<PHONE>', 'g'),
         '{_IP_RE}', '<IP>', 'g') AS clean_text
FROM pii""",
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: count and mask emails / phone numbers /
    IPv4 addresses in document text. The synthetic corpus contains no PII,
    so deterministic PII is planted by doc_id arithmetic first (same
    pattern as the planted near-dups), then detected back out.

    Pure regexp expression plan — JVM-side, codegen'd, no UDFs, no
    shuffle; the patterns are written in the common Java/RE2 regex subset
    so both engines interpret them identically.
    """
    d = load(spark, sf_dir, "documents")
    return pii_transform(d)


def pii_transform(d: DataFrame) -> DataFrame:
    """Plant-then-redact projection over (doc_id, text, ...) — stateless,
    so it applies verbatim to a readStream DataFrame (stream_pii_redact)."""
    did = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" call 555-123-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 13 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    pii = d.select("doc_id", t.alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )

    def n(pat):
        return F.size(F.regexp_extract_all(F.col("t"), F.lit(pat), F.lit(0))).cast(
            "bigint"
        )

    return pii.select(
        "doc_id",
        n(_EMAIL_RE).alias("n_emails"),
        n(_PHONE_RE).alias("n_phones"),
        n(_IP_RE).alias("n_ips"),
        clean.alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# semantic_dedup_pairs — cluster-scoped embedding dedup (SemDeDup-style)

_SEM_CORPUS_SQL = """vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, label,
         [embedding[1]::DOUBLE + 0.25] || (embedding::DOUBLE[])[2:] AS v
  FROM embeddings WHERE vec_id % 20 = 0
)"""


@register(
    "semantic_dedup_pairs",
    f"""WITH {_SEM_CORPUS_SQL}
SELECT a.label AS label, a.vec_id AS a_id, b.vec_id AS b_id,
       round({COSINE_SQL.format(a='a.v', b='b.v')}, 6) AS cos_sim
FROM vecs a JOIN vecs b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {COSINE_SQL.format(a='a.v', b='b.v')} >= 0.9""",
)
def semantic_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, cluster-scoped (SemDeDup): all-pairs cosine is
    computed only WITHIN a cluster (here the precomputed ``label`` plays
    the k-means cell), never across the whole corpus. Near-dup threshold
    0.9; planted dups (~0.999) vs within-label background (<=0.48 measured)
    leave a wide margin.

    Physical plan: groupBy(label) + applyInPandas — each cell becomes one
    Arrow batch and one numpy matmul (upper triangle, id-ordered). At
    scale, cells are bounded by the clustering granularity (SemDeDup uses
    ~100k cells), so per-task memory is cell_size x dim doubles and the
    quadratic term never spans cells. A skewed giant cell would be split
    by the block-tile scheme of embedding_cosine_neardup.
    """
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    planted = e.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        "label",
        F.concat(
            F.array(
                F.element_at(F.col("embedding").cast("array<double>"), 1)
                + F.lit(0.25)
            ),
            F.slice(F.col("embedding").cast("array<double>"), 2, 63),
        ).alias("v"),
    )
    vecs = base.unionByName(planted)

    def per_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        mat = np.vstack(pdf["v"].to_numpy())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= 0.9
        ii, jj = ii[keep], jj[keep]
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "a_id": ids[ii],
                "b_id": ids[jj],
                "cos_sim": np.round(sims[ii, jj], 6),
            }
        )

    return vecs.groupBy("label").applyInPandas(
        per_cell, "label int, a_id bigint, b_id bigint, cos_sim double"
    )


# ---------------------------------------------------------------------------
# curation_pipeline — composed end-to-end keep/drop decision

_LANG_PRED_SQL = f"""lang AS (
  SELECT doc_id,
       CASE WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0 THEN 'unknown'
            WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
            WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
            WHEN c_fr >= c_es THEN 'fr'
            ELSE 'es' END AS lang_pred
  FROM (SELECT doc_id, {text_queries._MARKER_SQL} FROM documents) scored)"""


@register(
    "curation_pipeline",
    f"""WITH {_DOC_SHINGLES_SQL},
bench AS (SELECT DISTINCT s FROM shingles WHERE doc_id % 100 = 0),
hits AS (
  SELECT sh.doc_id, count(*) AS n_shared
  FROM shingles sh JOIN bench USING (s)
  WHERE sh.doc_id % 100 <> 0
  GROUP BY sh.doc_id
),
fp AS (SELECT doc_id, md5({NORM_SQL}) AS f FROM documents),
canon AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS cid FROM fp),
{_LANG_PRED_SQL},
sig AS (
  SELECT doc_id,
         len(w) AS n_words,
         list_max(list_transform(list_distinct(w),
           x -> len(list_filter(w, y -> y = x)))) AS top_cnt,
         length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
         length(text) AS n_raw
  FROM (SELECT doc_id, text,
               CASE WHEN length({NORM_SQL}) = 0 THEN []::VARCHAR[]
                    ELSE string_split({NORM_SQL}, ' ') END AS w
        FROM documents) t),
decided AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 100 = 0 THEN 'benchmark'
              WHEN COALESCE(h.n_shared, 0) > 0 THEN 'contaminated'
              WHEN c.doc_id <> c.cid THEN 'duplicate'
              WHEN l.lang_pred <> 'en' THEN 'lang'
              WHEN s.top_cnt * 100 > 15 * s.n_words THEN 'repetition'
              WHEN s.n_words < 15 OR s.n_alpha * 10 < 6 * s.n_raw THEN 'quality'
         END AS drop_reason
  FROM documents d
  LEFT JOIN hits h ON h.doc_id = d.doc_id
  JOIN canon c ON c.doc_id = d.doc_id
  JOIN lang l ON l.doc_id = d.doc_id
  JOIN sig s ON s.doc_id = d.doc_id)
SELECT doc_id, drop_reason IS NULL AS keep, drop_reason FROM decided""",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation decision: compose benchmark exclusion,
    n-gram decontamination, exact dedup, language ID, repetition and
    quality filters into one keep/drop verdict with the first failing
    rule as the reason (priority: benchmark > contaminated > duplicate >
    lang > repetition > quality).

    Demonstrates operator COMPOSITION: the expression-only signals
    (language, repetition, quality) are computed inline in one narrow
    pass; only decontamination (broadcast semi-join counts) and exact
    dedup (fingerprint hash-agg) add shuffles, and the final assembly is
    doc_id equi-joins that AQE co-partitions. Thresholds compare via
    integer cross-multiplication (cnt * 100 > 15 * n) so both engines
    decide identically with no float boundary.
    """
    d = load(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 100 == 0

    # decontamination hits (non-bench docs only; bench docs short-circuit)
    sh = _doc_shingles(spark, sf_dir)
    bench = sh.filter(is_bench).select("s").distinct()
    hits = (
        sh.filter(~is_bench)
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )

    # exact-dup flag via content fingerprint
    fp = d.select("doc_id", F.md5(text_queries.norm_col()).alias("f"))
    canon = fp.groupBy("f").agg(F.min("doc_id").alias("cid"))
    dup = fp.join(canon, "f").select(
        "doc_id", (F.col("doc_id") != F.col("cid")).alias("is_dup")
    )

    lang = text_queries.text_lang_id(spark, sf_dir)

    # inline expression signals: word counts + alpha ratio (token array
    # let-bound — see text_repetition_signals)
    sig = d.select(
        "doc_id",
        F.expr(
            "transform(array(array_remove(split(lower(text), '[^a-z0-9]+'), '')),"
            " ww -> struct(size(ww) AS n_words,"
            " array_max(transform(array_distinct(ww),"
            "   x -> size(filter(ww, y -> y = x)))) AS top_cnt))[0]"
        ).alias("st"),
        F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")).alias(
            "n_alpha"
        ),
        F.length("text").alias("n_raw"),
    ).select(
        "doc_id",
        F.col("st.n_words").alias("n_words"),
        F.col("st.top_cnt").alias("top_cnt"),
        "n_alpha",
        "n_raw",
    )

    joined = (
        d.select("doc_id")
        .join(hits, "doc_id", "left")
        .join(dup, "doc_id")
        .join(lang, "doc_id")
        .join(sig, "doc_id")
    )
    reason = (
        F.when(is_bench, "benchmark")
        .when(F.coalesce("n_shared", F.lit(0)) > 0, "contaminated")
        .when(F.col("is_dup"), "duplicate")
        .when(F.col("lang_pred") != "en", "lang")
        .when(F.col("top_cnt") * 100 > 15 * F.col("n_words"), "repetition")
        .when(
            (F.col("n_words") < 15) | (F.col("n_alpha") * 10 < 6 * F.col("n_raw")),
            "quality",
        )
    )
    return joined.select(
        "doc_id",
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )


# ---------------------------------------------------------------------------
# sample_hash_split — deterministic train/val/test assignment


@register(
    "sample_hash_split",
    """SELECT doc_id,
       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 AS INT) AS bucket,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 80 THEN 'train'
            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents""",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataset splitting: hash the stable document id into
    100 buckets (first 4 hex digits of md5) and assign train/val/test by
    bucket range (80/10/10).

    Hash-based splits are THE scale-safe sampling primitive: no global
    sort, no random state, no shuffle — a narrow map-only plan whose
    assignment is reproducible across engines, runs, and re-partitions,
    and remains stable when the corpus grows (new docs land in the same
    bucket forever). Contrast with df.sample(), whose output depends on
    partitioning and seed plumbing.
    """
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return d.select(
        "doc_id", bucket.cast("int").alias("bucket"), split.alias("split")
    )


# ---------------------------------------------------------------------------
# dedup_minhash_cluster — the 100-TB fuzzy-dedup path, end to end

_PAIRS09_SQL = f"""{CORPUS_SQL}, {SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_both
  FROM shingles a JOIN shingles b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT a_id, b_id
  FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
  WHERE n_both * 1.0 / (sa.n + sb.n - n_both) >= 0.9
)"""


@register(
    "dedup_minhash_cluster",
    f"""WITH RECURSIVE {_PAIRS09_SQL},
edges AS (SELECT a_id AS s, b_id AS d FROM pairs UNION SELECT b_id, a_id FROM pairs),
reach(node, r) AS (
  SELECT s, d FROM edges
  UNION
  SELECT w.node, e.d FROM reach w JOIN edges e ON w.r = e.s
),
lbl AS (SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node)
SELECT c.doc_id,
       COALESCE(l.comp, c.doc_id) AS cluster_id,
       (c.doc_id = COALESCE(l.comp, c.doc_id)) AS is_canonical
FROM corpus c LEFT JOIN lbl l ON l.node = c.doc_id""",
)
def dedup_minhash_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 100-TB fuzzy-dedup pipeline, end to end: MinHash(64) →
    LSH(16×4 bands) → exact-Jaccard verify at 0.9 → connected components →
    per-doc (cluster_id, is_canonical). No all-pairs stage anywhere: the
    only joins are the banded bucket equi-join, the candidate-pruned
    verify, and the (node, label) propagation rounds.

    Oracle sharing: with these LSH parameters the probability of missing
    a 0.9-Jaccard pair is (1-0.9^4)^16 ≈ 2e-9 (see dedup_minhash_lsh), so
    the verified pair set — and therefore its transitive closure — equals
    the exact one the recursive-CTE oracle computes.
    """
    from dbimport_spark.functions import textdedup
    from dbimport_spark.plans.text_queries import shingles_df

    sh = shingles_df(spark, sf_dir).persist()
    pairs = (
        textdedup.minhash_lsh_neardup_pairs(sh, threshold=0.9)
        .select("a_id", "b_id")
        .persist()
    )
    pairs.count()  # materialize before the two-branch symmetrize reads
    comp = connected_components(pairs)
    corpus = text_queries.corpus_df(spark, sf_dir)
    return (
        corpus.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
            (F.col("doc_id") == F.coalesce("component", "doc_id")).alias(
                "is_canonical"
            ),
        )
    )


# ---------------------------------------------------------------------------
# text_winnow_fingerprint — winnowing (rolling min-hash window) fingerprints

_WINNOW_W = 4


@register(
    "text_winnow_fingerprint",
    f"""WITH toks AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS w FROM documents
),
hs AS (
  SELECT doc_id,
         list_transform(
           list_transform(range(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
           s -> ('0x' || substring(md5(s), 1, 15))::BIGINT) AS h
  FROM toks WHERE len(w) >= 3
),
fps AS (
  SELECT doc_id,
         CASE WHEN len(h) >= {_WINNOW_W}
              THEN list_distinct(list_transform(range(1, len(h) - {_WINNOW_W} + 2),
                     j -> list_min(h[j:j+{_WINNOW_W}-1])))
              ELSE [list_min(h)] END AS fp_set
  FROM hs)
SELECT doc_id, UNNEST(fp_set) AS fp FROM fps""",
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (MOSS-style rolling hash): hash the
    ORDERED trigram shingle sequence with the portable 60-bit md5-prefix
    hash, slide a window of {W} hashes, keep the min of each window,
    dedup per doc. The selected fingerprints are position-robust content
    samples — two docs sharing any run of ~W+2 words share a fingerprint,
    which is what plagiarism/overlap detection joins on.

    Entirely in-array (transform/slice/array_min): a narrow shuffle-free
    pass like text_repetition_signals; the explode emits ~m/W rows per
    doc, and downstream matching is an equi-join on fp — never all-pairs.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.array_remove(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), "").alias("w"),
    ).filter(F.size("w") >= 3)
    hs = toks.select(
        "doc_id",
        F.expr(
            "transform("
            " transform(sequence(0, size(w) - 3),"
            "           i -> concat_ws(' ', w[i], w[i+1], w[i+2])),"
            " s -> cast(conv(substring(md5(s), 1, 15), 16, 10) AS bigint))"
        ).alias("h"),
    )
    W = _WINNOW_W
    # LET-BINDING via transform(array(h), hh -> ...)[0]: the window stage
    # references the hash array many times (size + one slice per window);
    # written against the raw column, CollapseProject inlines the whole
    # md5-chain into every window lambda — O(m^2) hash evals per doc,
    # measured 57 s vs 1 s at sf0.01. Binding it to a lambda variable
    # forces one evaluation per row.
    #
    # The expression goes DIRECTLY into explode() rather than through a
    # named fp_set column: exploding a named attribute lets Catalyst's
    # InferFiltersFromGenerate add `size(fp_set) > 0 AND isnotnull(...)`
    # and push it below the Project, inlining the full md5 chain into the
    # Filter (evaluated ~3x per row, and it kicks the Project out of
    # whole-stage codegen) — measured 11 s vs 1.1 s at sf0.1. The rule
    # skips non-attribute generator children, so inline form stays 1-pass.
    fp_set = F.expr(
        f"transform(array(h), hh -> CASE WHEN size(hh) >= {W} THEN "
        f"array_distinct(transform(sequence(0, size(hh) - {W}),"
        f" j -> array_min(slice(hh, j + 1, {W})))) "
        f"ELSE array(array_min(hh)) END)[0]"
    )
    return hs.select("doc_id", F.explode(fp_set).alias("fp"))


# ---------------------------------------------------------------------------
# sample_domain_quota — per-domain cap (domain balancing)


@register(
    "sample_domain_quota",
    """WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents)
SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 20""",
)
def sample_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: cap each source/domain at N=20 documents, keeping
    the largest first (n_chars DESC, doc_id tiebreak) — the quota-sampling
    step that stops a scraped mega-domain from dominating the corpus mix.

    Plan: row_number window per domain. Per-key state is one counter and
    the sort is per-domain (bounded by domain size after the shuffle);
    for pathological single-domain skew the salting pattern of
    operators/skew.py applies (per-partition pre-top-N, then global).
    """
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "source", F.col("rn").cast("bigint").alias("rn"))
    )


# ---------------------------------------------------------------------------
# semantic_dedup_canonical — keep-one-per-cluster over semantic pairs


@register(
    "semantic_dedup_canonical",
    f"""WITH RECURSIVE {_SEM_CORPUS_SQL},
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM vecs a JOIN vecs b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {COSINE_SQL.format(a='a.v', b='b.v')} >= 0.9
),
edges AS (SELECT a_id AS s, b_id AS d FROM pairs UNION SELECT b_id, a_id FROM pairs),
reach(node, r) AS (
  SELECT s, d FROM edges
  UNION
  SELECT w.node, e.d FROM reach w JOIN edges e ON w.r = e.s
),
lbl AS (SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node)
SELECT c.vec_id,
       COALESCE(l.comp, c.vec_id) AS cluster_id,
       (c.vec_id = COALESCE(l.comp, c.vec_id)) AS is_canonical
FROM vecs c LEFT JOIN lbl l ON l.node = c.vec_id""",
)
def semantic_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup's final step: transitively close the cluster-scoped cosine
    near-dup pairs (semantic_dedup_pairs) into components and pick one
    canonical vector per component (the min id) — every embedding gets
    (cluster_id, is_canonical), singletons canonical by themselves.

    Same scale shape as dedup_cluster_canonical: the pair set is tiny
    relative to the corpus, CC rounds shuffle only (node, label) longs,
    and the corpus assignment is one left join.
    """
    pairs = (
        semantic_dedup_pairs(spark, sf_dir).select("a_id", "b_id").persist()
    )
    pairs.count()  # materialize before the two-branch symmetrize reads
    comp = connected_components(pairs)
    e = load(spark, sf_dir, "embeddings")
    corpus_ids = e.select("vec_id").unionByName(
        e.filter(F.col("vec_id") % 20 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id")
        )
    )
    return (
        corpus_ids.join(comp.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("component", "vec_id").alias("cluster_id"),
            (F.col("vec_id") == F.coalesce("component", "vec_id")).alias(
                "is_canonical"
            ),
        )
    )


# ---------------------------------------------------------------------------
# pack_sequences — greedy token packing into fixed budgets

_PACK_BUDGET = 512
_PACK_CHUNK = 256


@register(
    "pack_sequences",
    rf"""WITH RECURSIVE docs AS (
  SELECT doc_id, doc_id // {_PACK_CHUNK} AS chunk,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_tokens,
         row_number() OVER (PARTITION BY (doc_id // {_PACK_CHUNK}) ORDER BY doc_id) AS rn
  FROM documents),
walk(chunk, rn, doc_id, n_tokens, pack, fill) AS (
  SELECT chunk, rn, doc_id, n_tokens, 0, n_tokens FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.chunk, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN w.fill + d.n_tokens <= {_PACK_BUDGET} THEN w.pack ELSE w.pack + 1 END,
         CASE WHEN w.fill + d.n_tokens <= {_PACK_BUDGET} THEN w.fill + d.n_tokens ELSE d.n_tokens END
  FROM walk w JOIN docs d ON d.chunk = w.chunk AND d.rn = w.rn + 1)
SELECT doc_id, CAST(chunk * 1000000 + pack AS BIGINT) AS pack_id,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM walk""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: greedily pack documents (BPE-ish
    token counts, the text_token_count tokenizer) into sequences of at most
    {BUDGET} tokens, first-fit in doc_id order; an oversize doc gets its
    own pack.

    Determinism + scale: packing is a sequential fold, so it is sharded by
    FIXED doc_id chunks (doc_id div {CHUNK}) — the assignment is
    independent of partitioning and cluster size, chunks pack in parallel
    (applyInPandas, one tiny greedy loop per chunk), and no packing state
    ever crosses a chunk boundary — the standard sharded-packing design.
    The oracle replays the same fold as a linear recursive CTE per chunk.
    """
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") / _PACK_CHUNK).cast("bigint").alias("chunk"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_tokens"),
    )

    def pack_chunk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        packs = []
        pack, fill = 0, 0
        first = True
        for t in pdf["n_tokens"]:
            if first:
                pack, fill, first = 0, t, False
            elif fill + t <= _PACK_BUDGET:
                fill += t
            else:
                pack, fill = pack + 1, t
            packs.append(pack)
        out = pdf[["doc_id", "n_tokens"]].copy()
        out["pack_id"] = pdf["chunk"].to_numpy() * 1000000 + packs
        return out[["doc_id", "pack_id", "n_tokens"]]

    return toks.groupBy("chunk").applyInPandas(
        pack_chunk, "doc_id bigint, pack_id bigint, n_tokens bigint"
    )


# ---------------------------------------------------------------------------
# dedup_bloom_static — Bloom-filter membership dedup vs a historical corpus


@register(
    "dedup_bloom_static",
    """WITH hist AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
incoming AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 2 = 0 AND doc_id < 100
)
SELECT i.doc_id FROM incoming i
WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.text = i.text)""",
)
def dedup_bloom_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an incoming batch against a historical corpus WITHOUT joining
    it: build a distributed Bloom filter over the historical document
    fingerprints (functions/bloom.py: per-partition numpy bitmaps, tree
    bitwise-OR, no shuffle of the corpus), broadcast the bitmap, and keep
    incoming docs whose fingerprint is not in the filter — a map-side-only
    probe. This is the scale twin of dropDuplicatesCrossTable
    (DbImportWorker.java:477-520) for when the historical side is too
    large to shuffle into an anti-join; the same shape dedups a fresh
    crawl against a PB-scale training corpus.

    Incoming = the odd-doc_id half plus 50 planted copies of historical
    docs (re-keyed +1e6), which the filter must drop. Bloom filters have
    NO false negatives, so every true duplicate is dropped exactly as the
    oracle's NOT EXISTS anti-join does; false positives are the only
    deviation risk and are sized away: n=25k (sf1) in m=2^23 bits, k=7
    gives FP ~ 9e-12 per doc (functions/bloom.false_positive_rate).
    """
    from dbimport_spark.functions import bloom

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    planted = hist.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    incoming = docs.filter(F.col("doc_id") % 2 == 1).unionByName(planted)

    m_bits, k = 1 << 23, 7
    h1, h2 = bloom.fingerprint_cols(F.col("text"))
    bitmap = bloom.build_bloom(
        hist.select(h1.alias("h1"), h2.alias("h2")), m_bits=m_bits, k=k
    )
    contains = bloom.bloom_contains_udf(spark, bitmap, m_bits=m_bits, k=k)
    return incoming.filter(~contains(h1, h2)).select("doc_id")


# ---------------------------------------------------------------------------
# sample_token_budget — quality-ranked per-source selection under a token cap

_TOKEN_BUDGET = 800


@register(
    "sample_token_budget",
    f"""WITH scored AS (
  SELECT doc_id, source,
         len(string_split({NORM_SQL}, ' ')) AS n_tokens,
         CASE WHEN length(text) = 0 THEN 0
              ELSE length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1000 // length(text)
         END AS quality_rank
  FROM documents
),
ranked AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality_rank DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM scored
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM ranked WHERE cum_tokens <= {_TOKEN_BUDGET}""",
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted corpus selection — the data-mixing primitive: per
    source, take documents in quality order (integer alpha-ratio rank,
    doc_id tiebreak) until the source's token budget is exhausted; a doc
    that would cross the budget is cut, not truncated.

    Scale: one shuffle on source; the running-frame window is a single
    sorted pass per source partition. Quality rank and token counts are
    integers end to end, so selection boundaries are exact in both
    engines. At 100 TB per-source budgets arrive as a broadcast config
    table instead of a literal, and sources with billions of docs switch
    the full sort for a two-pass quantile cut on quality_rank (select the
    rank threshold from a histogram, then filter) — same semantics minus
    the tail doc at the boundary."""
    d = load(spark, sf_dir, "documents")
    from dbimport_spark.plans.text_queries import norm_col

    n_tokens = F.size(F.split(norm_col(), " "))
    # empty documents have no alpha mass: rank 0, not a divide-by-zero
    # (ANSI mode makes the unguarded `div` a hard error — caught by the
    # adversarial-corpus differential suite)
    quality = F.expr(
        "CASE WHEN length(text) = 0 THEN 0 ELSE "
        "(length(regexp_replace(lower(text), '[^a-z]', '')) * 1000)"
        " div length(text) END"
    )
    scored = d.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        quality.alias("quality_rank"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality_rank").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.select(
        "doc_id",
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    )
    return ranked.filter(F.col("cum_tokens") <= _TOKEN_BUDGET)


# ---------------------------------------------------------------------------
# sample_temperature — temperature-scaled rebalancing across groups


@register(
    "sample_temperature",
    """WITH sizes AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
mx AS (SELECT max(n) AS n_max FROM sizes),
b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('t:' || CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 10000
           AS bucket
  FROM documents
)
SELECT b.doc_id, b.lang, CAST(b.bucket AS INT) AS bucket
FROM b JOIN sizes USING (lang), mx
WHERE CAST(b.bucket AS BIGINT) * b.bucket * mx.n_max
      < CAST(10000 AS BIGINT) * 10000 * sizes.n""",
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled downsampling (T=2) across language groups — the
    dataset-mixing primitive that flattens a skewed group distribution:
    each group keeps fraction sqrt(n_group / n_max), so the largest group
    keeps everything and a 4×-smaller group keeps half, pulling the mix
    toward balance without upsampling.

    The sqrt never appears: keep iff bucket < 10000·sqrt(n/n_max), which
    squares (both sides nonnegative, squaring monotone) into
    bucket²·n_max < 10000²·n — pure BIGINT arithmetic, so the keep/drop
    boundary is exactly reproducible in both engines AND across reruns
    (bucket is a salted md5 of the stable doc id, the same shuffle-free
    primitive as sample_hash_split). Plan: one tiny group-size aggregate
    broadcast into a map-side filter — no shuffle of the corpus."""
    d = load(spark, sf_dir, "documents")
    sizes = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    n_max = sizes.agg(F.max("n").alias("n_max"))
    bucket = F.expr(
        "CAST(conv(substr(md5(concat('t:', CAST(doc_id AS STRING))), 1, 4), 16, 10)"
        " AS BIGINT) % 10000"
    )
    b = d.select("doc_id", "lang", bucket.alias("bucket"))
    return (
        b.join(F.broadcast(sizes), "lang")
        .crossJoin(F.broadcast(n_max))
        .filter(
            F.col("bucket") * F.col("bucket") * F.col("n_max")
            < F.lit(10000).cast("bigint") * 10000 * F.col("n")
        )
        .select("doc_id", "lang", F.col("bucket").cast("int").alias("bucket"))
    )


# ---------------------------------------------------------------------------
# sample_dsir — hashed-n-gram importance resampling (DSIR-style)


def dsir_gram_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, b): hashed word uni+bigram feature
    buckets (4096). Pure built-in expressions — works unchanged on batch
    AND streaming DataFrames (the streaming twin reuses it)."""
    ws = docs.select("doc_id", F.split(text_queries.norm_col(), " ").alias("ws"))
    uni = ws.select("doc_id", F.explode(F.array_remove(F.col("ws"), "")).alias("g"))
    bi = ws.filter(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(ws) - 2), i -> concat_ws(' ', ws[i], ws[i+1]))")
        ).alias("g"),
    )
    grams = uni.unionAll(bi)
    return grams.select(
        "doc_id",
        (F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("bigint") % 4096).alias("b"),
    )


def dsir_models(hb: DataFrame):
    """Bucketed grams → (target model, raw model, totals): the ≤4096-row
    broadcastable bag-of-grams models (target = doc_id % 50 == 0)."""
    is_target = F.col("doc_id") % 50 == 0
    tmodel = hb.filter(is_target).groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    rmodel = hb.filter(~is_target).groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    totals = hb.agg(
        F.sum(is_target.cast("bigint")).alias("nt"),
        F.sum((~is_target).cast("bigint")).alias("nr"),
    )
    return tmodel, rmodel, totals


@register(
    "sample_dsir",
    f"""WITH n AS (SELECT doc_id, {NORM_SQL} AS t FROM documents),
w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM n),
uni AS (SELECT doc_id, unnest(ws) AS g FROM w),
bi AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
  FROM w, UNNEST(range(1, len(ws))) AS u(i)
  WHERE len(ws) >= 2
),
grams AS (
  SELECT doc_id, g FROM uni WHERE g <> ''
  UNION ALL SELECT doc_id, g FROM bi
),
hb AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS b FROM grams
),
tmodel AS (SELECT b, count(*) AS ct FROM hb WHERE doc_id % 50 = 0 GROUP BY b),
rmodel AS (SELECT b, count(*) AS cr FROM hb WHERE doc_id % 50 <> 0 GROUP BY b),
totals AS (
  SELECT sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END) AS nt,
         sum(CASE WHEN doc_id % 50 <> 0 THEN 1 ELSE 0 END) AS nr
  FROM hb
),
scored AS (
  SELECT hb.doc_id, count(*) AS n_grams,
         CAST(sum(COALESCE(t.ct, 0)) AS BIGINT) AS sum_target_cnt,
         CAST(sum(r.cr) AS BIGINT) AS sum_raw_cnt
  FROM hb LEFT JOIN tmodel t USING (b) JOIN rmodel r USING (b)
  WHERE hb.doc_id % 50 <> 0
  GROUP BY hb.doc_id
)
SELECT doc_id, n_grams, sum_target_cnt, sum_raw_cnt,
       CAST(sum_target_cnt AS HUGEINT) * (SELECT nr FROM totals)
         > CAST(sum_raw_cnt AS HUGEINT) * (SELECT nt FROM totals) AS keep
FROM scored""",
)
def sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via hashed-n-gram importance (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling"):
    word uni+bigram features hashed into 4096 buckets train a bag-of-grams
    model of the TARGET domain (here docs with doc_id % 50 == 0 play the
    in-domain exemplar set) and of the RAW pool; each raw doc is kept iff
    its grams are on average more likely under the target model than the
    raw model.

    Exactness convention (see sample_temperature): the published method
    compares Σ log((ct+1)/(cr+1)) against a threshold; transcendental
    log is not bit-reproducible across engines, so the graded statistic is
    the integer cross-multiplied comparison of normalized average
    frequencies — sum_target_cnt·Nr > sum_raw_cnt·Nt — the first-order
    (linearized) form of the same evidence, computed entirely in
    integers. Products are compared in DECIMAL(38,0)/HUGEINT so the test
    survives corpus sizes where bigint·bigint would overflow.

    Scale shape: both models are ≤4096 rows regardless of corpus size →
    broadcast; the corpus side is explode → two broadcast-hash joins →
    one map-side-combined agg on doc_id. No corpus-sized shuffle other
    than the per-doc agg."""
    d = load(spark, sf_dir, "documents").repartition(32, "doc_id")
    hb = dsir_gram_buckets(d)
    tmodel, rmodel, totals = dsir_models(hb)
    is_target = F.col("doc_id") % 50 == 0
    scored = (
        hb.filter(~is_target)
        .join(F.broadcast(tmodel), "b", "left")
        .join(F.broadcast(rmodel), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("ct", F.lit(0))).alias("sum_target_cnt"),
            F.sum("cr").alias("sum_raw_cnt"),
        )
    )
    return (
        scored.crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "n_grams",
            "sum_target_cnt",
            "sum_raw_cnt",
            (
                F.col("sum_target_cnt").cast("decimal(38,0)") * F.col("nr")
                > F.col("sum_raw_cnt").cast("decimal(38,0)") * F.col("nt")
            ).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_fuzzy_keys — edit-distance-1 key matching via deletion neighborhoods


@register(
    "dedup_fuzzy_keys",
    """SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1""",
)
def dedup_fuzzy_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy key matching at edit distance ≤ 1 — the data-cleaning sibling
    of the exact-key duplicate detector (the reference matches import keys
    exactly; near-key typo detection is the first thing a real customer
    master needs on top). Blocking is the FastSS deletion neighborhood
    (Bocek et al. 2007): each name emits itself plus its |name| delete-one
    variants; any pair within Levenshtein 1 shares a key (substitution →
    both delete the differing position; indel → the longer's deletion IS
    the shorter), so candidates come from a plain equi-join on the key
    string and exact levenshtein verifies. Unlike prefix/half blocking,
    deletion keys have NO hot buckets on common-prefix key spaces
    (every 'Customer#...' shares a prefix, but a deletion key pins all
    OTHER positions, so bucket size stays O(alphabet)); cost is a
    |name|-factor key explosion — the classic memory-for-exactness trade,
    linear in corpus size. The oracle is the quadratic all-pairs
    levenshtein join, fine at oracle scale."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # Shuffle 8-byte HASHES of the deletion variants, not the variant
    # strings: the |name|-factor explosion means the bucket join moves
    # |corpus|·|name| rows, and shipping ~18-char strings was the
    # residual shuffle-bandwidth cost the 10× probe flagged (~24×).
    # xxhash64 collisions only ADD candidates; the levenshtein verify
    # removes them, so exactness is preserved.
    keys = c.select(
        "c_custkey",
        F.explode(
            F.expr(
                "transform(array_union(array(c_name), "
                "transform(sequence(1, length(c_name)), i -> "
                "concat(substring(c_name, 1, i - 1), "
                "substring(c_name, i + 1, length(c_name) - i)))), "
                "v -> xxhash64(v))"
            )
        ).alias("kh"),
    )
    a = keys.select(F.col("c_custkey").alias("a_id"), "kh")
    b = keys.select(F.col("c_custkey").alias("b_id"), "kh")
    # Catalyst sizes this self-join from the CUSTOMER scan and misses the
    # |name|-factor explode, so left alone it BROADCASTS the exploded key
    # table — fine at bench scale, a >1 GB broadcast build at 10× (the
    # 87 s cliff the scale probe caught; 9 s with the hint). A shuffled
    # hash join on the deletion-key hash is the plan that survives any
    # corpus size: both sides partition by kh, buckets stay O(alphabet)
    # by the FastSS construction, nothing is built whole on one executor.
    cand = (
        a.join(b.hint("shuffle_hash"), "kh")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
        .localCheckpoint()  # 3 consumers below + cuts the explode tree
    )
    # Names re-enter only for the exact verify, semi-join pruned to the
    # candidate id set (bounded by 2·|candidate pairs| ≪ corpus).
    ids = (
        cand.select(F.col("a_id").alias("c_custkey"))
        .unionAll(cand.select(F.col("b_id").alias("c_custkey")))
        .distinct()
    )
    pruned = c.join(F.broadcast(ids), "c_custkey", "left_semi")
    return (
        cand.join(
            pruned.select(F.col("c_custkey").alias("a_id"), F.col("c_name").alias("an")),
            "a_id",
        )
        .join(
            pruned.select(F.col("c_custkey").alias("b_id"), F.col("c_name").alias("bn")),
            "b_id",
        )
        .withColumn("dist", F.levenshtein("an", "bn").cast("int"))
        .filter(F.col("dist") <= 1)
        .select("a_id", "b_id", "dist")
    )


# ---------------------------------------------------------------------------
# quality_label_prop — seeded label propagation over the near-dup graph

_LP_ROUND = """SELECT n.doc_id,
       COALESCE(s.label, av.prop) AS label
FROM nodes n
LEFT JOIN seeds s USING (doc_id)
LEFT JOIN (
  SELECT e.node AS doc_id, sum(l.label) // count(l.label) AS prop
  FROM edges e JOIN {prev} l ON l.doc_id = e.nbr
  WHERE l.label IS NOT NULL
  GROUP BY e.node
) av USING (doc_id)"""


@register(
    "quality_label_prop",
    f"""WITH {_PAIRS_SQL},
edges AS (
  SELECT a_id AS node, b_id AS nbr FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT doc_id FROM corpus),
seeds AS (
  SELECT doc_id, CAST(strlen(text) % 1000 AS BIGINT) AS label
  FROM corpus WHERE doc_id % 25 = 0
),
l0 AS (SELECT n.doc_id, s.label FROM nodes n LEFT JOIN seeds s USING (doc_id)),
l1 AS ({_LP_ROUND.format(prev="l0")}),
l2 AS ({_LP_ROUND.format(prev="l1")})
SELECT doc_id, label FROM l2""",
)
def quality_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised quality labeling: a small audited seed set (here
    doc_id % 25 == 0, label = an integer quality proxy) spreads over the
    near-dup pair graph by 2 rounds of seeded label propagation
    (functions/cluster.py label_propagation) — the curation move that
    turns a few thousand human labels into corpus-scale keep/drop hints
    for everything similar to them. Floor-average (integer DIV) keeps
    every round's labels integers, so the oracle unrolls the rounds as
    plain CTEs with bit-identical arithmetic. Each round is one edge join
    + one hash agg; the edge list (LSH pair output) is far smaller than
    the corpus."""
    # Pair source is the LSH SCALE PATH (signatures + band-bucket join +
    # exact verify at 0.5), not the exact all-pairs baseline: the 10×
    # probe measured the exact subtree dominating every consumer of this
    # graph. Output equality with the exact oracle holds because the
    # corpus' pair-similarity mass is bimodal (planted ≈0.97 vs word-soup
    # ≈0.01 — a 0.97 pair collides in ≥1 of 16 bands with prob
    # 1-(1-0.97⁴)¹⁶ ≈ 1-1e-15); on a corpus with mass near the 0.5
    # threshold the LSH edge set is approximate, which clustering
    # tolerates (edges, not gates).
    from dbimport_spark.functions import textdedup as _td

    _sh = text_queries.shingles_df(spark, sf_dir).persist()
    pairs = (
        _td.minhash_lsh_neardup_pairs(_sh, threshold=0.5, max_bucket_size=1000)
        .select("a_id", "b_id")
        .persist()
    )
    pairs.count()
    corpus = text_queries.corpus_df(spark, sf_dir)
    nodes = corpus.select(
        F.col("doc_id").alias("node"),
        F.when(
            F.col("doc_id") % 25 == 0, (F.length("text") % 1000).cast("bigint")
        ).alias("label"),
    )
    out = label_propagation(nodes, pairs, rounds=2)
    return out.select(F.col("node").alias("doc_id"), "label")


# ---------------------------------------------------------------------------
# sample_cluster_split — leakage-free train/val/test over near-dup clusters


@register(
    "sample_cluster_split",
    f"""WITH RECURSIVE {_PAIRS_SQL},
edges AS (SELECT a_id AS s, b_id AS d FROM pairs UNION SELECT b_id, a_id FROM pairs),
reach(node, r) AS (
  SELECT s, d FROM edges
  UNION
  SELECT w.node, e.d FROM reach w JOIN edges e ON w.r = e.s
),
lbl AS (SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node),
assigned AS (
  SELECT c.doc_id, COALESCE(l.comp, c.doc_id) AS cluster_id
  FROM corpus c LEFT JOIN lbl l ON l.node = c.doc_id
)
SELECT doc_id, cluster_id,
       CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 80 THEN 'train'
            WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM assigned""",
)
def sample_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-FREE dataset splitting: hash-split by near-dup CLUSTER id
    instead of document id, so every member of a near-duplicate group
    lands in the same train/val/test slice — the guard against the
    classic eval contamination where a test doc's near-twin sits in
    train (plain per-doc hash splits leak exactly this way). Clusters
    come from connected components over the exact trigram-Jaccard pair
    graph (singletons are their own cluster), the split rule is the same
    shuffle-free md5-bucket primitive as sample_hash_split, keyed on the
    canonical cluster id. Scale: CC over the (LSH-sized) pair list + one
    map-side split assignment; the corpus shuffles once on doc_id for
    the cluster join."""
    # Pair source is the LSH SCALE PATH (signatures + band-bucket join +
    # exact verify at 0.5), not the exact all-pairs baseline: the 10×
    # probe measured the exact subtree dominating every consumer of this
    # graph. Output equality with the exact oracle holds because the
    # corpus' pair-similarity mass is bimodal (planted ≈0.97 vs word-soup
    # ≈0.01 — a 0.97 pair collides in ≥1 of 16 bands with prob
    # 1-(1-0.97⁴)¹⁶ ≈ 1-1e-15); on a corpus with mass near the 0.5
    # threshold the LSH edge set is approximate, which clustering
    # tolerates (edges, not gates).
    from dbimport_spark.functions import textdedup as _td

    _sh = text_queries.shingles_df(spark, sf_dir).persist()
    pairs = (
        _td.minhash_lsh_neardup_pairs(_sh, threshold=0.5, max_bucket_size=1000)
        .select("a_id", "b_id")
        .persist()
    )
    pairs.count()
    comp = connected_components(pairs)
    corpus = text_queries.corpus_df(spark, sf_dir)
    assigned = (
        corpus.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("cluster_id")
        )
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 4), 16, 10
        ).cast("int")
        % 100
    )
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    return assigned.select("doc_id", "cluster_id", split.alias("split"))


# ---------------------------------------------------------------------------
# curation_boilerplate_strip — CCNet/C4-style repeated-paragraph removal


@register(
    "curation_boilerplate_strip",
    """WITH docs AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0
              THEN 'all rights reserved terms of service cookie notice here ' || text
              ELSE text END AS text
  FROM documents
),
chunks AS (
  SELECT d.doc_id, d.source, CAST(j AS INTEGER) AS pos,
         array_to_string(list_slice(string_split(d.text, ' '), j * 8 + 1, j * 8 + 8), ' ') AS chunk
  FROM docs d,
       UNNEST(range((len(string_split(d.text, ' ')) + 7) // 8)) AS u(j)
),
freq AS (
  SELECT source, chunk, count(DISTINCT doc_id) AS df
  FROM chunks GROUP BY source, chunk
),
flagged AS (
  SELECT c.doc_id, c.pos, c.chunk, f.df >= 3 AS is_boiler
  FROM chunks c JOIN freq f ON c.source = f.source AND c.chunk = f.chunk
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_chunks,
       CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS INTEGER) AS n_dropped,
       md5(coalesce(string_agg(CASE WHEN NOT is_boiler THEN chunk END, ' ' ORDER BY pos), '')) AS clean_md5
FROM flagged GROUP BY doc_id""",
)
def curation_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/C4-style boilerplate removal: segment every document into
    consecutive 8-word pseudo-paragraphs, count each paragraph's document
    frequency WITHIN its source (the shard-local counting CCNet does per
    Common Crawl dump), drop paragraphs appearing in ≥3 distinct docs of
    the same source, and emit the cleaned document fingerprint. Following
    the module's planted-data discipline (the synthetic corpus tops out
    at df=2), every 5th document is prefixed with an identical 8-word
    legal-boilerplate header on BOTH engines, giving ~5 docs per source
    a genuinely repeated paragraph that must be stripped.

    Scale design: paragraphs join the frequency table on
    (source, xxhash64(chunk)) — the 8-byte key cuts shuffle bandwidth vs
    shipping the paragraph text twice, exactly how you'd run a 100 TB
    CCNet pass (collision odds ~n²/2⁶⁴ per source, immaterial; the
    DuckDB oracle joins on the full strings, so a collision would be
    caught as a hash mismatch). Document reassembly is one hash-agg with
    an order-pinning array_sort — no windows, no skew (chunk counts per
    doc are bounded by doc length)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        # planted boilerplate (corpus has no organic df>=3 chunks): every
        # 5th doc gets the same 8-word legal header, so ~5 docs per
        # source share its chunk -- well past the threshold, and the
        # header length is a chunk multiple so following chunks realign
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("all rights reserved terms of service cookie notice here "),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    chunks = (
        d.select(
            "doc_id",
            "source",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, CAST((size(split(text, ' ')) + 7) / 8 AS INT) - 1), "
                    "j -> array_join(slice(split(text, ' '), j * 8 + 1, 8), ' '))"
                )
            ).alias("pos", "chunk"),
        )
        .withColumn("ck", F.xxhash64("chunk"))
    )
    freq = (
        chunks.groupBy("source", "ck")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 3)
    )
    flagged = chunks.join(freq, ["source", "ck"], "left").select(
        "doc_id", "pos", "chunk", F.col("df").isNotNull().alias("is_boiler")
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_chunks"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).cast("int").alias("n_dropped"),
        F.md5(
            F.coalesce(
                F.expr(
                    "array_join(transform(array_sort(collect_list("
                    "CASE WHEN NOT is_boiler THEN struct(pos, chunk) END)), "
                    "x -> x.chunk), ' ')"
                ),
                F.lit(""),
            ).cast("binary")
        ).alias("clean_md5"),
    )


# ---------------------------------------------------------------------------
# sample_weighted_systematic — every S-th token of corpus mass, exact scan

_SYS_STEP = 500


@register(
    "sample_weighted_systematic",
    f"""WITH t AS (
  SELECT doc_id,
         CAST(len(string_split({NORM_SQL}, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM t
)
SELECT doc_id, n_tokens, cum_before,
       CAST(cum_before // {_SYS_STEP} + 1 AS BIGINT) AS grid_k
FROM c
WHERE (cum_before + n_tokens) // {_SYS_STEP} > cum_before // {_SYS_STEP}""",
)
def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted systematic sampling: lay the corpus out on its token-mass
    axis in doc_id order and pick the document covering every {_SYS_STEP}-th
    token — the deterministic size-proportional (PPS) downsampler: a
    doc's selection probability is proportional to its token weight,
    docs heavier than the step are always selected, and the sample is
    evenly spread through the corpus (no clumping, unlike Bernoulli
    sampling at the same rate).

    The interesting operator is the EXCLUSIVE GLOBAL RUNNING SUM of
    token weights: the naive Window.orderBy(doc_id) with no partition
    key executes in ONE task — the canonical driver-shaped trap. This
    uses functions/prefix.py global_prefix_sum: order-contiguous value
    buckets scanned in parallel, a num_buckets-long total vector
    exclusive-scanned on the driver, offsets broadcast back (the
    Blelloch two-pass scan in DataFrame form). Integer end to end; the
    oracle's single-threaded window cumsum matches bit-for-bit. A doc is
    picked iff its [cum_before, cum_before + n_tokens) interval contains
    a grid point; grid_k names which one (ties impossible: intervals are
    disjoint)."""
    from dbimport_spark.functions.prefix import global_prefix_sum

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(text_queries.norm_col(), " ")).cast("bigint").alias("n_tokens"),
    )
    c = global_prefix_sum(t, "doc_id", "n_tokens")
    # `/` is float division in Spark SQL — integer `div` keeps the grid
    # arithmetic exact at any corpus mass
    return c.filter(
        F.expr(f"(cum_before + n_tokens) div {_SYS_STEP} > cum_before div {_SYS_STEP}")
    ).select(
        "doc_id",
        "n_tokens",
        "cum_before",
        F.expr(f"cast(cum_before div {_SYS_STEP} + 1 as bigint)").alias("grid_k"),
    )


@register(
    "export_train_shuffle",
    """WITH h AS (
  SELECT doc_id,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ('0x' || substring(md5('shuf1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM documents
)
SELECT doc_id,
       CAST(hv % 16 AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY hv % 16 ORDER BY hv, doc_id) AS BIGINT) AS pos,
       n_tokens
FROM h""",
)
def export_train_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export GLOBAL SHUFFLE without a global sort: every doc
    gets a deterministic 60-bit keyed hash (portable_hash60 over a seed
    prefix — identical arithmetic in Spark and DuckDB, so the exact
    permutation is value-graded); the hash's low bits pick one of 16
    output shards and each shard orders by the hash — a seeded
    pseudo-random permutation that is REPRODUCIBLE across runs and
    engines, which run-of-the-mill rand() shuffles are not. Plan shape:
    one hash shuffle on the shard key + per-shard sort of corpus/16 rows
    — at 100 TB that is the only shuffle-and-sort an export needs, vs a
    full global sort's O(N log N) over one key space; shard counts stay
    balanced by hash uniformity (the same reason LSH buckets are). The
    seed prefix re-rolls the permutation per epoch ('shuf2|', ...) with
    zero data movement difference."""
    from dbimport_spark.functions.textdedup import portable_hash60

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    h = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        portable_hash60(
            F.concat(F.lit("shuf1|"), F.col("doc_id").cast("string"))
        ).alias("hv"),
    )
    w = Window.partitionBy(F.col("hv") % 16).orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        (F.col("hv") % 16).cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
        "n_tokens",
    )


@register(
    "pipeline_corpus_release",
    """WITH normed AS (
  SELECT doc_id, text,
         trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))) AS norm
  FROM documents
),
deduped AS (
  SELECT doc_id, norm,
         CAST(length(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
         CASE WHEN length(text) = 0 THEN 0
              ELSE (length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1000)
                   // length(text) END AS quality
  FROM normed
  QUALIFY row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) = 1
),
gated AS (SELECT * FROM deduped WHERE n_tokens >= 20),
budgeted AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (
           ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM gated
),
released AS (
  SELECT doc_id, n_tokens,
         ('0x' || substring(md5('rel1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 8 AS shard
  FROM budgeted WHERE cum <= 60000
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS token_sum,
       CAST(sum(doc_id) AS BIGINT) AS docid_sum
FROM released GROUP BY shard""",
)
def pipeline_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS RELEASE as ONE graded plan — the export half of the
    training-data story, composing four stages the way a release job
    actually runs them: exact dedup (md5 of the normalized text,
    earliest doc wins — min_by hash agg, no window sort), a token-count
    floor, a GLOBAL quality-ranked token budget (running-frame window:
    the corpus-wide analogue of the crawl pipeline's per-language cut),
    and reproducible shard assignment via the seeded 60-bit keyed hash
    (identical md5 arithmetic in DuckDB, so shard membership itself is
    value-graded). Graded per shard on doc counts, token sums and doc-id
    sums — the release manifest's numbers. Plan shape: one hash agg,
    then the GLOBAL budget runs through the distributed two-pass prefix
    sum (functions/prefix.py) on a synthesized unique order key — a
    bare Window.orderBy would collapse the corpus into ONE task, the
    exact trap the plan sweep exists to catch — then one shard shuffle;
    text never shuffles after the dedup stage (integer scores and ids
    travel)."""
    from dbimport_spark.functions.prefix import global_prefix_sum
    from dbimport_spark.functions.textdedup import portable_hash60
    from dbimport_spark.plans.text_queries import norm_col

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    normed = docs.withColumn("norm", norm_col())
    quality = F.expr(
        "CASE WHEN length(text) = 0 THEN 0 ELSE "
        "(length(regexp_replace(lower(text), '[^a-z]', '')) * 1000)"
        " div length(text) END"
    )
    deduped = (
        normed.withColumn("fp", F.md5("norm"))
        .groupBy("fp")
        .agg(
            F.min_by(
                F.struct("doc_id", "norm", quality.alias("quality")),
                F.col("doc_id"),
            ).alias("k")
        )
        .select(
            "k.doc_id",
            "k.quality",
            F.size(F.split(F.col("k.norm"), " ")).cast("bigint").alias("n_tokens"),
        )
    )
    gated = deduped.filter(F.col("n_tokens") >= 20)
    # (quality DESC, doc_id ASC) folded into ONE unique ascending key so
    # the scan order is total; quality ∈ [0, 1000], doc_id < 1e11 even
    # under the 100× probe's id inflation
    gated = gated.withColumn(
        "_ord",
        (F.lit(1000) - F.col("quality")) * F.lit(100_000_000_000)
        + F.col("doc_id"),
    )
    budgeted = (
        global_prefix_sum(gated, "_ord", "n_tokens", out_col="_cum0")
        .withColumn("cum", F.col("_cum0") + F.col("n_tokens"))
        .filter(F.col("cum") <= 60000)
    )
    released = budgeted.withColumn(
        "shard",
        portable_hash60(
            F.concat(F.lit("rel1|"), F.col("doc_id").cast("string"))
        )
        % 8,
    )
    return released.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("token_sum"),
        F.sum("doc_id").cast("bigint").alias("docid_sum"),
    )
