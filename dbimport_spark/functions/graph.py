"""Distributed graph primitives: fixed-point PageRank, triangle counting.

Companion to functions/cluster.py (connected components, label
propagation). The iteration arithmetic is fixed-point integer — see
plans/learned_queries.py for the oracle-exactness rationale — so results
are independent of partitioning, accumulation order, and checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Synchronous PageRank (d = 0.85) over a directed edge list;
    returns (node, pr) with pr in fixed-point 1e-9 rank units.

    Every iteration is one equi-join of the (persisted) degree-annotated
    edge list with the rank vector plus a hash agg on the destination —
    the canonical distributed PageRank round. ``checkpoint_every`` bounds
    LINEAGE at high iteration counts: each rank plan nests the previous
    one, so 50 un-checkpointed rounds build a 50-deep join tree that
    bloats optimizer time and makes task retries recompute everything;
    localCheckpoint(eager) every k rounds truncates the plan to the
    materialized blocks (rank values are exact integers, so checkpointing
    cannot change results — asserted in tests). At 5 demo iterations the
    default (no checkpoint) is fine; real web-graph runs (30-50 rounds)
    should set k ≈ 5-10."""
    e0 = edges.select(src_col, dst_col)
    deg = e0.groupBy(src_col).agg(F.count(F.lit(1)).alias("outdeg"))
    # NOTE (r10 audit): no explicit repartition(src) is needed before the
    # persist — in the non-broadcast regime (big graphs, the case where
    # per-round edge reshuffles would hurt) the degree join itself runs
    # as a sort-merge join on src, so the cached edge list already
    # carries hashpartitioning(src) and every iteration's join reuses it
    # with NO per-round edge Exchange (verified: executed one-round plan
    # with autoBroadcast disabled shows SortMergeJoin directly over
    # InMemoryTableScan on the edge side). At demo scale ranks broadcast
    # and partitioning is moot either way.
    edges_w = e0.join(deg, src_col).persist()
    # N and the rank vector span ALL nodes (src ∪ dst), not just sources:
    # sink-only nodes must count toward N and receive rank, and nodes with
    # zero in-degree must keep their base rank across iterations so their
    # OUTBOUND contribution isn't silently dropped after round 1 — the
    # standard-PageRank behavior on arbitrary directed graphs. (Dangling
    # mass — rank held by nodes with no out-edges — is not redistributed;
    # that is the usual simplification and is deterministic.)
    nodes = (
        e0.select(F.col(src_col).alias("node"))
        .union(e0.select(F.col(dst_col).alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    base = (15 * SCALE) // (100 * n_nodes)
    # The set of nodes RECEIVING contributions (distinct dst) is constant
    # across iterations, so the complement — zero-in-degree nodes, whose
    # rank is pinned at base from iteration 1 on — is a constant frame too.
    # Appending it by union costs nothing per round, where a left join of
    # the full node set against the contribution sums would add a shuffle
    # per iteration (measured +24% on the bench graph).
    zero_in = nodes.join(
        e0.select(F.col(dst_col).alias("node")).distinct(), "node", "left_anti"
    ).persist()
    zero_in_base = zero_in.select("node", F.lit(base).cast("bigint").alias("r"))
    ranks = nodes.select(
        "node",
        # bigint from round 0: 85·r must evaluate in long arithmetic
        # (an INT literal overflows 32-bit under ANSI on small graphs
        # where r0 = SCALE/N is large)
        F.lit(SCALE // n_nodes).cast("bigint").alias("r"),
    )
    for i in range(iters):
        contrib = edges_w.join(ranks, F.col(src_col) == F.col("node")).select(
            F.col(dst_col).alias("_d"), F.expr("(85 * r) div (100 * outdeg)").alias("c")
        )
        ranks = (
            contrib.groupBy("_d")
            .agg(F.sum("c").alias("s"))
            .select(F.col("_d").alias("node"), (F.lit(base) + F.col("s")).alias("r"))
            .unionByName(zero_in_base)
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").cast("bigint").alias("pr"))


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_edges_max: int = 20_000_000,
    include_degrees: bool = False,
) -> DataFrame:
    """Per-node triangle participation counts over an UNDIRECTED graph;
    returns (node, n_tri) for every node in at least one triangle.
    With ``include_degrees`` the output is (node, deg, n_tri) over EVERY
    node (n_tri coalesced to 0) — the inputs of the local clustering
    coefficient, reusing the degree table the orientation already built.

    The input edge list may contain either or both directions and
    self-loops; it is canonicalized (a < b), self-loops dropped, and
    deduplicated first, so callers can pass raw co-occurrence pairs.

    Algorithm: degree orientation (a.k.a. the compact-forward /
    Latapy ordering). Every edge {u, v} is directed from the endpoint
    that is SMALLER under the total order (degree(x), x) — ties broken
    by node id. Under that orientation every out-degree is O(sqrt(m)),
    so the wedge join below materializes at most O(m^1.5) candidate
    paths regardless of how skewed the raw degree distribution is —
    THE property that makes distributed triangle counting survive
    power-law graphs (a celebrity node with 10^6 neighbors contributes
    wedges only through its low-degree-oriented out-edges, not 10^12
    neighbor pairs). Each triangle {u < v < w} (orientation order) is
    found exactly once as the wedge u→v, v→w closed by the edge u→w.

    Plan shape (all hash joins + one hash agg — no window sorts):
      1. canonical edges  — one shuffle on (a, b) for the distinct
      2. degrees          — one hash agg over the endpoint stream
      3. oriented edges   — edges ⋈ degrees twice (degree rides along)
      4. wedges           — oriented ⋈ oriented on the shared middle node
      5. closure          — wedges ⋈ oriented on (u, w): a semi-join,
                            survivors are exactly the triangles
      6. per-node counts  — explode each (u, v, w) to 3 rows, hash agg
    The oriented edge list is referenced three times inside the single
    output plan, so it is persisted (plain persist, not checkpoint —
    bounded references within one action, per the lineage rules in
    NOTES.md). Counting is exact integer arithmetic; the result is
    independent of partitioning, so a DuckDB oracle using the NATURAL
    a < b orientation (same triangle set, different discovery order)
    matches value-for-value.

    Strategy gate (both produce the identical triangle set): when the
    oriented edge list fits a broadcast (edge count × 16 B under
    ``broadcast_edges_max`` bytes — one cheap count() on the persisted
    frame), BOTH wedge-expansion joins go map-side against the
    broadcast hash table, so the O(m^1.5) wedge stream is generated AND
    closure-filtered inside each task — nothing wedge-sized ever
    shuffles (measured 12.5 s → ~3 s at the 1.2M-edge bench graph,
    where the shuffle plan moves ~10^8 wedge rows). Past the broadcast
    bound — the true 100 TB regime — the shuffle plan takes over:
    wedges partition on the middle node, the closure is a shuffled
    semi-join on (u, w); a runtime bloom filter on the edge set would
    prune that shuffle further and is the documented next step if a
    real workload hits it.
    """
    a, b = F.col(src_col), F.col(dst_col)
    # persist: e feeds the degree agg AND both orientation joins — three
    # references, and its upstream (the caller's co-occurrence self-join)
    # is the expensive part; unpersisted, Spark's tree-shaped plans
    # recompute it per reference (measured 3× the scan+join cost here)
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient by (deg, node): src = smaller endpoint under the total order.
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    o = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.col("a"),
            )
            .otherwise(F.col("b"))
            .alias("u"),
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.col("b"),
            )
            .otherwise(F.col("a"))
            .alias("v"),
        )
        .persist()
    )
    n_edges, max_node, min_node = o.agg(
        F.count(F.lit(1)),
        F.greatest(F.max("u"), F.max("v")),
        F.least(F.min("u"), F.min("v")),
    ).first()
    small = n_edges * 16 <= broadcast_edges_max
    o_right = (lambda df: F.broadcast(df)) if small else (lambda df: df)
    wedges = o.select(F.col("u"), F.col("v")).join(
        o_right(o.select(F.col("u").alias("v"), F.col("v").alias("w"))), "v"
    )
    if (
        max_node is not None
        and int(max_node) < (1 << 31)
        and min_node is not None
        and int(min_node) >= 0
    ):
        # pack the closure key into ONE long: the semi join then builds a
        # LongHashedRelation instead of a generic binary-key map — measured
        # 2× on the probe-bound closure pass (6.6 s → 3.2 s at 49M wedges).
        # The cast to long is load-bearing: on IntegerType ids shiftleft
        # would stay 32-bit and overflow, collapsing distinct (u, w) keys
        # into false wedge closures. Negative ids (excluded by the
        # min_node >= 0 gate) would collide the same way.
        key = lambda cu, cw: (  # noqa: E731
            F.shiftleft(cu.cast("long"), 31) + cw.cast("long")
        ).alias("k")
        tri = wedges.withColumn("k", key(F.col("u"), F.col("w"))).join(
            o_right(o.select(key(F.col("u"), F.col("v")))), "k", "left_semi"
        )
    else:
        tri = wedges.join(
            o_right(o.select(F.col("u"), F.col("v").alias("w"))),
            ["u", "w"],
            "left_semi",
        )
    counts = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    if not include_degrees:
        return counts
    return deg.join(counts, "node", "left").select(
        "node",
        F.col("deg").cast("bigint").alias("deg"),
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_tri"),
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """``rounds`` synchronous peeling iterations toward the k-core of an
    undirected graph: each round drops every node whose CURRENT degree is
    below k, then drops edges touching a dropped node. Returns
    (node, deg) — the surviving edge endpoints with their degree in the
    surviving subgraph. Run until fixpoint this IS the k-core; a fixed
    round count keeps the result well-defined (and oracle-unrollable)
    without convergence polling, the same diameter-bounded-iteration
    discipline as connected_components/pagerank.

    Plan per round: one endpoint hash agg (degrees) + two semi joins of
    the edge list against the survivor set — survivors are an agg output
    whose runtime size AQE sees, so it broadcasts them when they fit and
    shuffles otherwise; nothing in the loop is driver-sized. Each
    round's edge list is EAGERLY localCheckpoint'ed: it is the per-round
    barrier that the next round references three times (degree agg +
    both semi joins), exactly the NOTES.md lineage rule — a lazy persist
    here leaves the references racing to fill the cache inside one
    action and the round tree re-canonicalizes per reference (measured
    13 s → ~6 s at the 1.2M-edge bench graph).
    """
    a, b = F.col(src_col), F.col(dst_col)
    # eager from round 0 for the same three-references reason as below
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
