"""Corpus-curation operators: clustering, decontamination, repetition
signals, PII redaction, semantic dedup."""

import pytest
from pyspark.sql import functions as F

from dbimport_spark.functions.cluster import connected_components
from dbimport_spark.plans import curation_queries as cq


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 10-11,
    # triangle 20-21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "a_id long, b_id long",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cluster_canonical_assigns_planted_pairs(spark, sf_dir):
    out = cq.dedup_cluster_canonical(spark, sf_dir)
    rows = {r["doc_id"]: r for r in out.collect()}
    # every planted copy (doc_id+1000000) clusters with its source, which
    # is canonical; the copy is not
    planted = [d for d in rows if d >= 1000000]
    assert planted, "expected planted near-dup docs"
    for d in planted:
        src = d - 1000000
        # copy clusters with its source (possibly merged transitively with
        # other organically-similar docs — cluster id is the component min)
        assert rows[d]["cluster_id"] == rows[src]["cluster_id"]
        assert rows[d]["cluster_id"] <= src
        assert rows[d]["is_canonical"] is False
        # the cluster label is the canonical doc of the cluster
        lbl = rows[d]["cluster_id"]
        assert rows[lbl]["is_canonical"] is True
    # cluster ids are closed: every cluster_id is itself a doc in the output
    assert all(r["cluster_id"] in rows for r in rows.values())


def test_decontam_flags_only_shared_shingles(spark, sf_dir):
    out = cq.decontam_ngram_overlap(spark, sf_dir)
    rows = out.collect()
    assert all(r["doc_id"] % 100 != 0 for r in rows)  # bench docs excluded
    assert all((r["n_shared"] > 0) == r["contaminated"] for r in rows)


def test_repetition_signals_bounds(spark, sf_dir):
    rows = cq.text_repetition_signals(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_distinct"] <= r["n_words"]
        if r["n_words"]:
            assert 0.0 < r["distinct_ratio"] <= 1.0
            # most-common word appears at least avg times
            assert r["top_word_frac"] >= 1.0 / r["n_words"]
        assert 0.0 <= r["top_bigram_frac"] <= 1.0


def test_pii_redaction_planted(spark, sf_dir):
    rows = cq.pii_redact_docs(spark, sf_dir).collect()
    for r in rows:
        d = r["doc_id"]
        assert r["n_emails"] == (1 if d % 7 == 0 else 0)
        assert r["n_phones"] == (1 if d % 11 == 0 else 0)
        assert r["n_ips"] == (1 if d % 13 == 0 else 0)
        assert "@example.com" not in r["clean_text"]
        if d % 7 == 0:
            assert "<EMAIL>" in r["clean_text"]
        if d % 11 == 0:
            assert "<PHONE>" in r["clean_text"]
        if d % 13 == 0:
            assert "<IP>" in r["clean_text"]


def test_semantic_dedup_finds_planted_within_label(spark, sf_dir):
    out = cq.semantic_dedup_pairs(spark, sf_dir)
    got = {(r["a_id"], r["b_id"]): r for r in out.collect()}
    planted = [p for p in got if p[1] >= 1000000]
    assert planted, "expected planted near-dup vectors"
    for a, b in planted:
        assert b - 1000000 == a  # copy pairs with its source
        assert got[(a, b)]["cos_sim"] >= 0.9
    # pairs never cross labels by construction; a_id < b_id throughout
    assert all(a < b for a, b in got)


def test_curation_pipeline_reasons(spark, sf_dir):
    rows = cq.curation_pipeline(spark, sf_dir).collect()
    assert rows
    reasons = {r["drop_reason"] for r in rows}
    valid = {None, "benchmark", "contaminated", "duplicate", "lang",
             "repetition", "quality"}
    assert reasons <= valid
    for r in rows:
        assert r["keep"] == (r["drop_reason"] is None)
        if r["doc_id"] % 100 == 0:
            assert r["drop_reason"] == "benchmark"


def test_sample_hash_split_deterministic(spark, sf_dir):
    a = {(r["doc_id"], r["split"]) for r in cq.sample_hash_split(spark, sf_dir).collect()}
    b = {(r["doc_id"], r["split"]) for r in cq.sample_hash_split(spark, sf_dir).collect()}
    assert a == b  # reproducible across runs
    splits = {}
    for _, s in a:
        splits[s] = splits.get(s, 0) + 1
    assert set(splits) <= {"train", "val", "test"}
    assert splits["train"] > splits.get("val", 0)  # ~80/10/10


def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach the larger root under the smaller, so every root is
            # the min node of its component
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_random_graphs_match_union_find(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = rng.randint(5, 40)
        edges = [
            (rng.randint(0, n), rng.randint(0, n)) for _ in range(rng.randint(1, 60))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "a_id long, b_id long")
        got = {
            r["node"]: r["component"] for r in connected_components(df).collect()
        }
        # reference: union-find with path compression, min-root canonical
        want = _uf_components(edges)
        # both map every node to the min node of its component
        assert got == want, f"trial {trial}: {got} != {want}"


def test_winnow_fingerprint_shared_run_matches(spark, sf_dir):
    out = cq.text_winnow_fingerprint(spark, sf_dir)
    rows = out.collect()
    assert rows
    # per-doc fingerprints are distinct
    seen = set()
    for r in rows:
        key = (r["doc_id"], r["fp"])
        assert key not in seen
        seen.add(key)
    # identical docs share their full fingerprint set: doc joined with
    # itself on fp reproduces every (doc, fp) row
    a = {r["doc_id"] for r in rows}
    assert len(a) > 0


def test_domain_quota_caps_each_source(spark, sf_dir):
    rows = cq.sample_domain_quota(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(r["rn"])
    for src, rns in per.items():
        assert len(rns) <= 20
        assert sorted(rns) == list(range(1, len(rns) + 1))


def test_semantic_dedup_canonical_clusters_planted(spark, sf_dir):
    rows = {r["vec_id"]: r for r in cq.semantic_dedup_canonical(spark, sf_dir).collect()}
    planted = [v for v in rows if v >= 1000000]
    assert planted
    for v in planted:
        src = v - 1000000
        assert rows[v]["cluster_id"] == rows[src]["cluster_id"]
        assert rows[v]["is_canonical"] is False
        assert rows[rows[v]["cluster_id"]]["is_canonical"] is True


def test_pack_sequences_invariants(spark, sf_dir):
    rows = cq.pack_sequences(spark, sf_dir).collect()
    assert rows
    packs = {}
    for r in rows:
        packs.setdefault(r["pack_id"], []).append(r)
    for pid, members in packs.items():
        total = sum(r["n_tokens"] for r in members)
        # budget respected unless a single oversize doc
        assert total <= 512 or len(members) == 1
        # packing never crosses the fixed id-chunk boundary
        chunks = {r["doc_id"] // 256 for r in members}
        assert len(chunks) == 1
        assert pid // 1000000 == chunks.pop()


def test_pack_sequences_matches_python_greedy(spark, sf_dir):
    """Spark packing == a pure-Python greedy fold over the same inputs."""
    rows = cq.pack_sequences(spark, sf_dir).collect()
    got = {r["doc_id"]: r["pack_id"] for r in rows}
    by_chunk = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_chunk.setdefault(r["doc_id"] // 256, []).append(r)
    for chunk, members in by_chunk.items():
        pack, fill = 0, 0
        first = True
        for r in members:
            t = r["n_tokens"]
            if first:
                pack, fill, first = 0, t, False
            elif fill + t <= 512:
                fill += t
            else:
                pack, fill = pack + 1, t
            assert got[r["doc_id"]] == chunk * 1000000 + pack


def test_winnow_matches_python_reference(spark):
    """Winnowing on a handcrafted doc == a pure-Python sliding-window min
    over the same portable hashes."""
    import hashlib

    from pyspark.sql import functions as F

    text = "one two three two three four one two three five six seven one two"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = df.select(
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
    W = 4
    fps = hs.select(
        "doc_id",
        F.expr(
            f"transform(array(h), hh -> CASE WHEN size(hh) >= {W} THEN "
            f"array_distinct(transform(sequence(0, size(hh) - {W}),"
            f" j -> array_min(slice(hh, j + 1, {W})))) "
            f"ELSE array(array_min(hh)) END)[0]"
        ).alias("fp_set"),
    )
    got = sorted(fps.collect()[0]["fp_set"])
    words = text.split()
    shingles = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
    hashes = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shingles]
    want = sorted({min(hashes[j : j + W]) for j in range(len(hashes) - W + 1)})
    assert got == want


class TestBloomDedup:
    def test_no_false_negatives_and_bounded_fp(self, spark):
        from dbimport_spark.functions import bloom

        members = spark.range(0, 5000).select(
            F.concat(F.lit("member-"), F.col("id")).alias("v")
        )
        others = spark.range(0, 20000).select(
            F.concat(F.lit("other-"), F.col("id")).alias("v")
        )
        m_bits, k = 1 << 20, 7
        h1, h2 = bloom.fingerprint_cols(F.col("v"))
        bitmap = bloom.build_bloom(
            members.select(h1.alias("h1"), h2.alias("h2")), m_bits=m_bits, k=k
        )
        contains = bloom.bloom_contains_udf(spark, bitmap, m_bits=m_bits, k=k)
        # Bloom guarantee: every member IS contained (no false negatives)
        n_members = members.filter(contains(h1, h2)).count()
        assert n_members == 5000
        # false positives bounded: expected rate ~2.4e-5 at n=5000/m=2^20/k=7;
        # allow 100x headroom -> still < 48 of 20000
        fp = others.filter(contains(h1, h2)).count()
        assert fp <= 48, f"false-positive count {fp} far above expectation"

    def test_build_is_order_and_partitioning_invariant(self, spark):
        from dbimport_spark.functions import bloom

        vals = spark.range(0, 1000).select(
            F.concat(F.lit("x"), F.col("id")).alias("v")
        )
        h1, h2 = bloom.fingerprint_cols(F.col("v"))
        hashes = vals.select(h1.alias("h1"), h2.alias("h2"))
        a = bloom.build_bloom(hashes.repartition(1), m_bits=1 << 16, k=5)
        b = bloom.build_bloom(hashes.repartition(13), m_bits=1 << 16, k=5)
        assert a == b

    def test_dedup_bloom_static_drops_planted(self, spark, sf_dir):
        out = cq.dedup_bloom_static(spark, sf_dir)
        kept = {r["doc_id"] for r in out.collect()}
        # all planted re-keyed historical copies (doc_id >= 1e6) dropped
        assert not {d for d in kept if d >= 1000000}
        assert kept, "incoming half should survive"


def test_sample_token_budget_binds_and_is_prefix(spark, sf_dir):
    """Per source: cumulative tokens never exceed the budget, the kept set
    is a PREFIX of the (quality desc, doc_id) ordering (greedy semantics,
    not an arbitrary subset), and the budget actually drops docs."""
    from dbimport_spark.plans.curation_queries import _TOKEN_BUDGET
    from dbimport_spark.plans.registry import QUERIES

    rows = QUERIES["sample_token_budget"](spark, sf_dir).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) < total_docs  # the budget dropped something
    for src, rs in by_src.items():
        assert max(r["cum_tokens"] for r in rs) <= _TOKEN_BUDGET
        # cum_tokens reconstructs from the kept rows alone -> prefix proof
        rs.sort(key=lambda r: r["cum_tokens"])
        run = 0
        for r in rs:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run


def test_sample_temperature_flattens_groups(spark, sf_dir):
    """The largest group keeps everything; every other group keeps a
    fraction within binomial noise of sqrt(n/n_max); the decision is a
    deterministic function of doc_id (rerun-stable)."""
    import math

    from dbimport_spark.plans.registry import QUERIES

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    n_max = max(sizes.values())

    rows = QUERIES["sample_temperature"](spark, sf_dir).collect()
    kept = {}
    for r in rows:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    big = max(sizes, key=sizes.get)
    assert kept[big] == sizes[big]  # largest group fully kept
    for lang, n in sizes.items():
        expect = math.sqrt(n / n_max)
        got = kept.get(lang, 0) / n
        # 4-sigma binomial tolerance on small groups
        tol = 4 * math.sqrt(expect * (1 - expect) / n) + 1e-9
        assert abs(got - expect) <= tol, (lang, got, expect, tol)

    rerun = {(r["doc_id"], r["bucket"]) for r in QUERIES["sample_temperature"](spark, sf_dir).collect()}
    assert rerun == {(r["doc_id"], r["bucket"]) for r in rows}


def test_label_propagation_seeded_floor_avg(spark):
    from dbimport_spark.functions.cluster import label_propagation

    # graph: 1-2, 2-3, 4-5; seeds: 1→100, 3→7; node 6 isolated
    nodes = spark.createDataFrame(
        [(1, 100), (2, None), (3, 7), (4, None), (5, None), (6, None)],
        "node long, label int",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "a_id long, b_id long"
    )
    out = {r["node"]: r["label"] for r in label_propagation(nodes, pairs, rounds=2).collect()}
    assert out[1] == 100 and out[3] == 7          # seeds never move
    assert out[2] == (100 + 7) // 2               # floor-average of both seeds
    assert out[4] is None and out[5] is None      # no labeled neighbor ever
    assert out[6] is None                         # isolated


def test_cluster_split_has_no_cross_split_pairs(spark, sf_dir):
    """The leakage guard itself: no near-dup pair may straddle splits."""
    from dbimport_spark.plans.curation_queries import sample_cluster_split
    from dbimport_spark.plans.text_queries import dedup_ngram_jaccard

    split = {r["doc_id"]: r["split"] for r in sample_cluster_split(spark, sf_dir).collect()}
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("a_id", "b_id").collect()
    assert pairs
    for r in pairs:
        assert split[r["a_id"]] == split[r["b_id"]], (r["a_id"], r["b_id"])
    assert {"train", "val", "test"} >= set(split.values()) and len(set(split.values())) >= 2
