"""Near-duplicate detection sketches: MinHash + LSH banding, SimHash.

These are the 100 TB paths. The exact n-gram Jaccard baseline
(plans/text_queries.py) self-joins the full shingle table — fine at test
scale, quadratic blow-up on frequent shingles at corpus scale. MinHash-LSH
replaces it with a fixed-width signature per document (one aggregation)
and a band-bucket equi-join whose candidate sets are tiny; SimHash gives a
64-bit fingerprint with pigeonhole banding for hamming search.

Everything below is built-in Spark expressions (xxhash64, bit ops,
aggregations) — no Python in the hot path; LSH parameters are plain
function arguments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Measured broadcast gate for DUPLICATE-PROPORTIONAL sets (candidate
# pairs, near-dup losers): on healthy corpora they are tiny and a
# broadcast hash join wins; on a real crawl they are corpus-proportional
# (tens of percent of captures) and a FORCED broadcast blows the 8 GB
# cap / OOMs the driver at exactly the scale that matters. So the hint
# is applied only when a measured count stays under this bar (5M id/pair
# rows ≈ tens of MB broadcast); above it the hint is dropped and
# Catalyst/AQE picks a shuffle join — same result, no cliff. The set is
# persisted/checkpointed by the caller before counting, so the count
# re-reads materialized rows, not the LSH pipeline.
BROADCAST_IDS_MAX = 5_000_000


def gated_broadcast(df: DataFrame, n_rows: int):
    """``F.broadcast(df)`` iff the measured row count is under
    BROADCAST_IDS_MAX, else ``df`` unhinted (shuffle join at scale)."""
    return F.broadcast(df) if n_rows <= BROADCAST_IDS_MAX else df


# ---------------------------------------------------------------- MinHash


def minhash_signatures(
    shingles: DataFrame,
    doc_col: str = "doc_id",
    shingle_col: str = "s",
    num_hashes: int = 64,
) -> DataFrame:
    """(doc, shingle) pairs → one row per doc with sig_0..sig_{n-1}.

    Hash family: the variable-length shingle is hashed ONCE
    (h = xxhash64(shingle)); the i-th family member is xxhash64(h, i) over
    the fixed-width 8-byte value. Re-hashing the full string per family
    member would cost 64× the string-hash work per row for no extra
    independence. One hash aggregation, map-side combined.
    """
    base = shingles.withColumn("_h", F.xxhash64(F.col(shingle_col)))
    aggs = [
        F.min(F.xxhash64(F.col("_h"), F.lit(i))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return base.groupBy(doc_col).agg(*aggs)


def _cap_buckets(exploded: DataFrame, keys: list[str], cap: int | None) -> DataFrame:
    """Skew valve for bucket self-joins: drop rows in buckets larger than
    ``cap`` BEFORE the join, so one hot bucket can never contribute O(B²)
    candidates (the quadratic term is bounded at cap² per bucket).

    Shape: one hash aggregation finds buckets above the cap (map-side
    combined, output = #hot buckets only — few by construction, since a
    uniform 64-bit hash doesn't build large buckets out of dissimilar
    docs unless the band is degenerate), then a BROADCAST anti-join drops
    their rows. This keeps the candidate self-join broadcastable and adds
    no sort — a windowed count over the join keys was measured 1.9×
    slower at sf0.1 because the window exchange forced the self-join out
    of broadcast. Recall cost is negligible by design: a genuinely
    similar pair collides in MANY independent buckets (≈ bands·s^r of 16
    for MinHash at j=0.9, chunks−max_hamming ≥ 1 of 4 for SimHash), so
    losing a degenerate hot bucket leaves the other collisions intact.
    """
    if cap is None:
        return exploded
    # Three consumers read ``exploded`` (the hot-bucket agg here plus both
    # sides of the caller's self-join). Materialize THIS narrow projection
    # — (doc, keys) longs — not the upstream signature table: caching the
    # 64-column signature rows instead was measured 2-4× slower per bench
    # run (wide columnar cache materialization on every run), while this
    # is a few longs per row and makes the expensive signature agg compute
    # exactly once. localCheckpoint rather than persist: it also
    # CUTS THE LOGICAL PLAN at this point, so the three consumers embed a
    # LogicalRDD leaf instead of three copies of the 64-expression
    # signature-aggregation tree — downstream consumers (verify, CC,
    # split assignment) otherwise multiply that tree combinatorially and
    # pay seconds of driver-side plan canonicalization per action.
    exploded = exploded.localCheckpoint()
    hot = (
        exploded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > cap)
        .select(*keys)
    )
    return exploded.join(F.broadcast(hot), keys, "left_anti")


def lsh_candidate_pairs(
    signatures: DataFrame,
    doc_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signatures and bucket-join: docs sharing any band bucket
    become a candidate pair (a < b).

    Shuffle profile: explode to (doc, band, band_hash) — bands× the doc
    count, NOT the shingle count — then a self equi-join on (band,
    band_hash). Bucket sizes are near-uniform (64-bit hashes) on healthy
    corpora; ``max_bucket_size`` is the skew valve for degenerate ones
    (boilerplate storms, near-empty docs): buckets above the cap are
    skipped in that band, bounding per-bucket work at cap² while the
    pair's other bands keep recall (see _cap_buckets).
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bh")))
    exploded = signatures.select(
        F.col(doc_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(doc_col, "bb.band", "bb.bh")
    exploded = _cap_buckets(exploded, ["band", "bh"], max_bucket_size)
    a = exploded.select(F.col(doc_col).alias("a_id"), "band", "bh")
    b = exploded.select(F.col(doc_col).alias("b_id"), "band", "bh")
    return (
        # shuffle-hash, not sort-merge: (band, bh) is a near-unique
        # 64-bit key, so sorting both sides buys nothing and the hash
        # build per tiny bucket is O(rows) — two sorts saved per run
        a.join(b.hint("shuffle_hash"), ["band", "bh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def verify_jaccard(
    candidates: DataFrame,
    shingles: DataFrame,
    doc_col: str = "doc_id",
    shingle_col: str = "s",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact Jaccard on candidate pairs only, semi-join pruned FIRST:
    the corpus shingle table is reduced to candidate docs' shingles via a
    semi-join before anything shuffles — at 100 TB the full (doc,
    shingle) table never moves, only the candidate neighborhoods do
    (candidate doc count is bounded by 2·|pairs|, orders of magnitude
    under the corpus after banding + the skew valve). The per-doc size
    aggregation runs on the pruned set too, not the corpus.

    Candidate pairs are DUPLICATE-PROPORTIONAL, so the two candidate-side
    joins broadcast only behind the measured gate (gated_broadcast): the
    checkpointed pair set is counted once, and above BROADCAST_IDS_MAX
    the hints drop to shuffle joins instead of forcing a broadcast that
    would OOM on a high-duplication crawl.

    ``candidates`` is localCheckpoint-ed (three consumers: the doc-list
    build and both pair joins) — the lineage cut keeps the self-join
    tree from appearing three times in the final plan, and makes the
    gate's count() a re-read of materialized rows, not a recompute."""
    candidates = candidates.localCheckpoint()
    n_pairs = candidates.count()
    cand_docs = (
        candidates.select(F.col("a_id").alias(doc_col))
        .unionAll(candidates.select(F.col("b_id").alias(doc_col)))
        .distinct()
    )
    # |cand_docs| ≤ 2·n_pairs, so one measured count gates both joins
    pruned = shingles.join(
        gated_broadcast(cand_docs, 2 * n_pairs), doc_col, "left_semi"
    ).persist()
    sizes = pruned.groupBy(doc_col).agg(F.count(F.lit(1)).alias("n"))
    sh_a = pruned.select(F.col(doc_col).alias("a_id"), F.col(shingle_col).alias("s"))
    sh_b = pruned.select(F.col(doc_col).alias("b_id"), F.col(shingle_col).alias("s"))
    inter = (
        sh_a.join(gated_broadcast(candidates, n_pairs), "a_id")
        .join(sh_b.hint("shuffle_hash"), ["b_id", "s"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    jacc = F.col("n_both") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("n_both"))
    return (
        inter.join(sizes.select(F.col(doc_col).alias("a_id"), F.col("n").alias("na")), "a_id")
        .join(sizes.select(F.col(doc_col).alias("b_id"), F.col("n").alias("nb")), "b_id")
        .select("a_id", "b_id", jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_neardup_pairs(
    shingles: DataFrame,
    doc_col: str = "doc_id",
    shingle_col: str = "s",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.9,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full MinHash→LSH→verify pipeline. With 64 hashes / 16 bands the
    probability of missing a pair at Jaccard 0.9 is (1-0.9^4)^16 ≈ 2e-9,
    so at verification threshold 0.9 the output equals the exact-Jaccard
    pair set with overwhelming probability — which is why this query can
    share the exact SQL oracle. ``max_bucket_size`` bounds hot-bucket
    blowup at corpus scale (see lsh_candidate_pairs)."""
    sigs = minhash_signatures(shingles, doc_col, shingle_col, num_hashes)
    cands = lsh_candidate_pairs(sigs, doc_col, num_hashes, bands, max_bucket_size)
    return verify_jaccard(cands, shingles, doc_col, shingle_col, threshold)


# ---------------------------------------------------------------- SimHash


def portable_hash60(col) -> "F.Column":
    """60-bit token hash computable identically in Spark AND DuckDB:
    the first 15 hex digits of md5, parsed as an integer. Spark:
    conv(substring(md5(c),1,15),16,10)::long; DuckDB:
    ('0x' || substring(md5(c),1,15))::BIGINT. Slower than xxhash64
    (md5 + string conv) — use it when cross-engine reproducibility
    matters more than hash throughput (e.g. the oracle-checked
    dedup_simhash query)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(
    tokens: DataFrame,
    doc_col: str = "doc_id",
    token_col: str = "tok",
    bits: int = 64,
    hash_col: "F.Column | None" = None,
) -> DataFrame:
    """``bits``-bit SimHash per doc: sum ±1 per bit over token hashes,
    take sign.

    One aggregation: per bit i, the ONES count sum(hash>>i & 1) plus one
    shared row count n; bit i of the fingerprint is set iff ones > n/2
    (identical boundary to the classic ±1 sum — 2·ones − n > 0 — but the
    branch-free bit extract aggregates ~1.5× faster). Token multiplicity
    acts as weight; the token is hashed once into a column and all ``bits``
    aggregates read the 8-byte value. ``hash_col`` overrides the default
    xxhash64 token hash (e.g. portable_hash60 for a DuckDB-reproducible
    fingerprint; pass bits=60 with it).
    """
    base = tokens.withColumn(
        "_h", hash_col if hash_col is not None else F.xxhash64(F.col(token_col))
    )
    h = F.col("_h")
    bit_sums = [
        F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1))).alias(f"o_{i}")
        for i in range(bits)
    ]
    agg = base.groupBy(doc_col).agg(F.count(F.lit(1)).alias("_n"), *bit_sums)
    fp = F.lit(0).cast("bigint")
    for i in range(bits):
        fp = fp.bitwiseOR(
            F.when(
                F.col(f"o_{i}") * 2 > F.col("_n"),
                F.shiftleft(F.lit(1).cast("bigint"), i),
            ).otherwise(0)
        )
    return agg.select(doc_col, fp.alias("simhash"))


def simhash_neardup_pairs(
    fingerprints: DataFrame,
    doc_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
    bits: int = 64,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via pigeonhole banding:
    with 4 16-bit chunks, any pair within hamming 3 shares at least one
    exact chunk — candidates are an equi-join on (chunk_idx, chunk_value),
    never an all-pairs scan. The guarantee needs chunks > max_hamming,
    independent of ``bits``.

    ``max_bucket_size`` caps hot chunk buckets (see _cap_buckets). Unlike
    MinHash banding, the pigeonhole guarantee has only chunks−max_hamming
    redundant collisions, so the cap here weakens the worst-case ≤hamming
    guarantee for pairs whose ONLY shared chunk is the hot one — set it
    well above the honest bucket ceiling (hot chunk values come from
    fingerprint degeneracy, e.g. all-zero simhashes of tiny docs, whose
    pairs are overwhelmingly non-duplicates anyway)."""
    width = bits // chunks
    mask = (1 << width) - 1
    chunk_cols = [
        F.struct(
            F.lit(i).alias("ci"),
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask)).alias("cv"),
        )
        for i in range(chunks)
    ]
    exploded = fingerprints.select(
        F.col(doc_col), F.col("simhash"), F.explode(F.array(*chunk_cols)).alias("c")
    ).select(doc_col, "simhash", "c.ci", "c.cv")
    exploded = _cap_buckets(exploded, ["ci", "cv"], max_bucket_size)
    a = exploded.select(
        F.col(doc_col).alias("a_id"), F.col("simhash").alias("ha"), "ci", "cv"
    )
    b = exploded.select(
        F.col(doc_col).alias("b_id"), F.col("simhash").alias("hb"), "ci", "cv"
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def lsh_probe_candidates(
    index_sigs: DataFrame,
    batch_sigs: DataFrame,
    doc_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = None,
    broadcast_batch: bool = False,
) -> DataFrame:
    """Incremental-ingest LSH probe: candidate pairs between a NEW batch
    and an existing indexed corpus — the bucket join runs batch×index
    only, never index×index, so re-ingesting N new documents against a
    100 TB corpus costs O(batch bands + matching buckets) instead of
    re-deriving the corpus pair set. Both sides must be banded with the
    same (num_hashes, bands) so bucket keys align (the hash family is
    deterministic — minhash_signatures).

    Returns (a_id=index doc, b_id=batch doc) distinct candidates. At real
    scale index_sigs is a PERSISTED table maintained across ingests
    (signatures are append-only per doc); here both sides derive from the
    same corpus to keep the query self-contained.

    ``broadcast_batch=True`` broadcasts the banded batch side — the shape
    for decontamination probes, where the batch is a fixed eval suite
    (thousands of docs, bands× rows) and the index is the full training
    corpus: the bucket join then runs map-side against each index
    partition with NO shuffle of the corpus bands."""
    rows_per_band = num_hashes // bands

    def banded(sigs: DataFrame, out: str) -> DataFrame:
        band_cols = []
        for b in range(bands):
            cols = [
                F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)
            ]
            band_cols.append(
                F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bh"))
            )
        e = sigs.select(
            F.col(doc_col).alias(out), F.explode(F.array(*band_cols)).alias("bb")
        ).select(out, "bb.band", "bb.bh")
        return e

    idx = banded(index_sigs, "a_id")
    new = banded(batch_sigs, "b_id")
    idx = _cap_buckets(idx, ["band", "bh"], max_bucket_size)
    if broadcast_batch:
        new = F.broadcast(new)
    return (
        new.join(idx, ["band", "bh"])
        .select("a_id", "b_id")
        .distinct()
    )
