"""Distributed Lloyd's k-means over an embedding column.

The workhorse behind corpus-scale embedding operations (SemDeDup-style
cluster scoping, IVF cell training, diversity sampling): each iteration
is one map-side assignment against a BROADCAST centroid table plus one
per-dimension hash aggregation — the classic Spark k-means shape (the
corpus never shuffles on anything wider than a small int key; centroid
state is k×dim driver floats).

Cross-engine exactness (so a fixed-iteration run can share a DuckDB
oracle): assignment distances are computed with sequential-fold
higher-order functions — the same left-to-right op tree DuckDB's
list_transform/list_aggregate uses — so per-row distances are
bit-identical; per-dimension centroid means ARE summed in different
orders across engines (Spark partial aggs), so centroids are rounded to
``round_decimals`` before the next broadcast, collapsing ulp-level
differences on both sides. Ties in the argmin break on the smaller
centroid id via struct ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_expr(cents: dict[int, list[float]], vec_col: str) -> "F.Column":
    """argmin over broadcast centroids as a single codegen'd expression:
    array_min over (distance, centroid_id) structs."""
    cands = []
    for cid in sorted(cents):
        vals = ", ".join(repr(x) + "D" for x in cents[cid])
        cands.append(
            f"struct(aggregate(zip_with({vec_col}, array({vals}), "
            f"(a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x) AS d, "
            f"{cid}L AS i)"
        )
    return F.expr(f"array_min(array({', '.join(cands)})).i")


def kmeans_assign(
    df: DataFrame,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_decimals: int = 6,
) -> DataFrame:
    """(id, vector) → (id, cluster) after ``n_iter`` Lloyd assignment
    rounds. Deterministic init: the k lowest-id vectors are the seeds and
    their ids are the (stable) cluster labels; clusters that empty out are
    dropped for subsequent rounds, mirroring the plain Lloyd's treatment.

    Driver state is k×dim floats per round; everything corpus-sized stays
    an assignment projection or a (cluster, dim)-keyed aggregation with
    map-side partials.
    """
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    cents = {int(r[id_col]): [float(x) for x in r[vec_col]] for r in rows}
    assigned = None
    for it in range(n_iter):
        assigned = df.select(
            id_col, vec_col, _assign_expr(cents, vec_col).alias("cluster")
        )
        if it == n_iter - 1:
            break
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("j", "x"))
            .groupBy("cluster", "j")
            .agg(F.round(F.avg("x"), round_decimals).alias("m"))
            .collect()
        )
        nxt: dict[int, dict[int, float]] = {}
        for r in means:
            nxt.setdefault(int(r["cluster"]), {})[int(r["j"])] = float(r["m"])
        cents = {
            cid: [dims[j] for j in sorted(dims)] for cid, dims in nxt.items()
        }
    return assigned.select(id_col, F.col("cluster").cast("int").alias("cluster"))
