"""Distributed connected components for near-duplicate clustering.

The missing piece between pair generation (MinHash-LSH / exact Jaccard /
SimHash emit PAIRS) and corpus curation (which needs one CLUSTER id per
document so exactly one canonical doc per near-dup group survives):
transitively close the pair graph.

Algorithm: iterative min-label propagation over the symmetrized edge
list — every node starts with label = min(self, neighbors) and each round
takes the min of its neighbors' labels, until a fixpoint. Each round is
one shuffle (join + groupBy min) and the loop is driver-coordinated with
a cheap convergence probe (`limit(1).count()` on changed labels), the
same shape GraphX/GraphFrames use. Rounds needed = graph diameter; for
near-dup clusters (stars/cliques around a template doc) the diameter is
tiny (2-3), so this beats the O(log n) large-star/small-star dance that
only pays off on long-chain graphs. ``max_iter`` bounds pathological
chains; each round persists its labels and unpersists the previous round
so lineage and storage stay O(1).

At 100 TB: the edge list after LSH banding is orders of magnitude smaller
than the corpus (only candidate pairs survive), labels are (node, label)
longs, and every round shuffles only that reduced set on the node key —
this is the standard production shape for fuzzy-dedup clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, a: str = "a_id", b: str = "b_id", max_iter: int = 25
) -> DataFrame:
    """Resolve undirected ``pairs`` (a, b) into components.

    Returns (node, component) for every node that appears in some pair;
    component = min node id reachable (a deterministic canonical label).
    Callers left-join this onto the full corpus and coalesce to self for
    singletons.
    """
    sym = pairs.select(F.col(a).alias("node"), F.col(b).alias("nbr")).unionAll(
        pairs.select(F.col(b).alias("node"), F.col(a).alias("nbr"))
    )
    sym = sym.persist()
    labels = (
        sym.groupBy("node")
        .agg(F.min("nbr").alias("m"))
        .select("node", F.least(F.col("node"), F.col("m")).alias("component"))
        .persist()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("nbr"), "component"), "nbr"
            )
            .groupBy("node")
            .agg(F.min("component").alias("nm"))
        )
        # Carry the previous label through the round so the convergence
        # probe is a filter on the already-joined result — one join per
        # round instead of two (the probe re-join was measurably ~25% of
        # round cost and grows with the label set at scale).
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("nm", "component")).alias(
                    "component"
                ),
                F.col("component").alias("_old"),
            )
            .persist()
        )
        changed = (
            new_labels.filter(F.col("component") != F.col("_old")).limit(1).count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", "component")


def label_propagation(
    nodes: DataFrame,
    pairs: DataFrame,
    rounds: int = 2,
    node_col: str = "node",
    label_col: str = "label",
    a: str = "a_id",
    b: str = "b_id",
) -> DataFrame:
    """Seeded label propagation over an undirected pair graph — the
    semi-supervised step of a curation pipeline (spread trusted quality
    labels from a small audited seed set to their near-duplicate
    neighborhoods). ``nodes`` carries every node with an INTEGER label
    for seeds and NULL for the rest; seeds never change, unlabeled nodes
    take the FLOOR-average of their labeled neighbors each round (integer
    division — deterministic and bit-identical in any engine, the same
    exactness convention as the fixed-point sketches; labels stay
    integers through every round, so a fixed-round run can share a plain
    SQL oracle).

    Each round is one join + one hash aggregation on the edge list (far
    smaller than the corpus after LSH pair generation); driver holds no
    per-node state. Unreachable nodes keep NULL.
    """
    sym = pairs.select(F.col(a).alias("node"), F.col(b).alias("nbr")).unionAll(
        pairs.select(F.col(b).alias("node"), F.col(a).alias("nbr"))
    )
    # Caches released by the CALLER after the consuming action
    # (dbimport_spark.release_caches) — an unpersist() here would run
    # EAGERLY at plan-build time, evicting the cache before the lazy
    # query ever executes (which is exactly what an earlier version did:
    # every round then re-derived the edge list).
    sym = sym.persist()
    node_ids = nodes.select(node_col).persist()
    cur = nodes.select(node_col, F.col(label_col).cast("bigint").alias("label"))
    seeds = cur.filter(F.col("label").isNotNull()).persist()
    for r in range(rounds):
        nbr_avg = (
            sym.join(
                cur.select(F.col(node_col).alias("nbr"), F.col("label").alias("nl")),
                "nbr",
            )
            .filter(F.col("nl").isNotNull())
            .groupBy("node")
            .agg(F.expr("sum(nl) DIV count(nl)").alias("prop"))
        )
        cur = (
            node_ids
            .join(seeds.withColumnRenamed("label", "seed"), node_col, "left")
            .join(nbr_avg.withColumnRenamed("node", node_col), node_col, "left")
            .select(
                node_col,
                F.coalesce(F.col("seed"), F.col("prop")).alias("label"),
            )
        )
        if r + 1 < rounds:
            # one (node, label) row per node: cheap to cache, and without
            # it round r+1's plan nests round r's joins wholesale
            cur = cur.persist()
    return cur
