"""Skew mitigation for hot join/aggregation keys.

At 100 TB a handful of hot keys (null-ish defaults, power users, filler
values) can pin a shuffle partition to one task. Two standing answers:

* AQE skew-join splitting (spark.sql.adaptive.skewJoin.enabled) — the
  first line of defense, free, handled at runtime; bench/tests run with
  AQE on.
* Explicit salting — for the cases AQE can't fix (skewed *aggregations*
  feeding windows, or sort-merge joins whose skewed side must stay
  unsplit): spread each hot key over `salt_buckets` sub-keys, replicate
  the other side per bucket, and re-combine.

Salting is correctness-invariant: the salt is derived deterministically
from row content, the replicated side covers every bucket, and the final
combine collapses the salt — results equal the unsalted plan exactly
(pinned by the skew_salted_join oracle query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt_buckets: int) -> DataFrame:
    """Deterministic per-row salt in [0, salt_buckets): hash of the whole
    row (content-derived, so re-runs and retries agree — no rand())."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)).cast("int")
    )


def replicate_for_salt(df: DataFrame, salt_buckets: int) -> DataFrame:
    """Cross the (small/medium) side with every salt bucket so the salted
    equi-join sees every pair exactly once."""
    buckets = F.array(*[F.lit(i) for i in range(salt_buckets)])
    return df.withColumn(SALT_COL, F.explode(buckets))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where `skewed` has hot keys: join key becomes
    (keys..., salt), splitting each hot key into salt_buckets tasks.
    `other` is replicated salt_buckets× — use only when `other` per-key
    cardinality is modest (dim-like), which is exactly the skew scenario
    (a broadcast join would be better still if `other` fits whole)."""
    lhs = with_salt(skewed, salt_buckets)
    rhs = replicate_for_salt(other, salt_buckets)
    return lhs.join(rhs, on + [SALT_COL], how).drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: aggregate on
    (keys, salt) first (splits hot groups across tasks), then combine.

    aggs: output_col -> (input_col, fn) with fn in {sum, count, min, max}
    (the algebraic aggregates that re-combine losslessly; count combines
    via sum in phase 2).
    """
    phase1_aggs = []
    phase2_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(col).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            phase1_aggs.append(getattr(F, fn)(col).alias(out))
            phase2_aggs.append(getattr(F, fn)(out).alias(out))
        else:  # pragma: no cover
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = with_salt(df, salt_buckets)
    p1 = salted.groupBy(*keys, SALT_COL).agg(*phase1_aggs)
    return p1.groupBy(*keys).agg(*phase2_aggs)
