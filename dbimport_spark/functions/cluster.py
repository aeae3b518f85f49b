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
    # Pre-aggregate to DISTINCT canonical edges before symmetrizing:
    # LSH/banding pair generators can emit the same pair from several
    # bands (and both orientations); every duplicate would be carried
    # through EVERY propagation round otherwise.
    edges = (
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("lo"),
            F.greatest(F.col(a), F.col(b)).alias("hi"),
        )
        .distinct()
    )
    sym = edges.select(F.col("lo").alias("node"), F.col("hi").alias("nbr")).unionAll(
        edges.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
    )
    # Materialize the edge list pre-partitioned on the per-round JOIN key
    # (nbr) and CUT ITS LINEAGE with an eager localCheckpoint: pair
    # generators arrive with deep plan trees (an LSH chain embeds the
    # shingle/signature subtree ~25×, since logical plans are trees, not
    # DAGs), and every propagation round would otherwise re-canonicalize
    # that whole forest — measured as ~12 s of pure driver-side planning
    # PER ROUND on an 8 k-pair graph. After the cut, each round plans
    # against a LogicalRDD leaf. (Trade: checkpointed blocks skip
    # fault-tolerant recompute — standard for iterative graph loops.)
    sym = sym.repartition("nbr").localCheckpoint()
    labels = (
        sym.groupBy("node")
        .agg(F.min("nbr").alias("m"))
        .select("node", F.least(F.col("node"), F.col("m")).alias("component"))
        .localCheckpoint()
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
        # localCheckpoint per round + a FULL-count convergence probe: the
        # count computes every partition, so the checkpoint is completely
        # filled each round (an earlier persist + limit(1) probe left
        # partitions unfilled and recomputed the whole chain at
        # consumption), and the next round's plan anchors at a leaf
        # instead of nesting this round's joins — without the cut the
        # label plan doubles per round (labels appears twice in the round
        # expression), giving 2^r planning blowup. Old rounds' blocks are
        # freed by the ContextCleaner when the DataFrame goes out of
        # scope.
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("nm", "component")).alias(
                    "component"
                ),
                F.col("component").alias("_old"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("component") != F.col("_old")).count()
        labels = new_labels
        if changed == 0:
            break
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
    # Distinct canonical edges first (band-duplicate pairs otherwise ride
    # through every round), then symmetrize and persist PRE-PARTITIONED on
    # the per-round join key (nbr) so each round's edge join reuses the
    # cached partitioning instead of re-shuffling the edge list.
    edges = (
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("lo"),
            F.greatest(F.col(a), F.col(b)).alias("hi"),
        )
        .distinct()
    )
    sym = edges.select(F.col("lo").alias("node"), F.col("hi").alias("nbr")).unionAll(
        edges.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
    )
    # localCheckpoint, not persist: cuts the pair generator's deep
    # plan tree (see connected_components) so each round plans against a
    # LogicalRDD leaf, and pre-partitions on the per-round join keys.
    sym = sym.repartition("nbr").localCheckpoint()
    node_ids = nodes.select(node_col).repartition(node_col).localCheckpoint()
    cur = nodes.select(node_col, F.col(label_col).cast("bigint").alias("label"))
    seeds = (
        cur.filter(F.col("label").isNotNull())
        .repartition(node_col)
        .localCheckpoint()
    )
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
            # one (node, label) row per node: cheap to materialize, and
            # without the lineage cut round r+1's plan nests round r's
            # joins wholesale (2^r planning blowup)
            cur = cur.localCheckpoint()
    return cur
