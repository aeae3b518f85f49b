"""Exact distributed percentiles via bucket counting.

Spark's ``percentile_disc(...) WITHIN GROUP`` is a sort-based aggregate with
no map-side partials: every row of a group is pulled into ONE task's sort
buffer. With few huge groups (e.g. 3 return flags over a 100 TB lineitem)
that is an OOM-shaped plan — the buffer is O(group rows).

This module computes the same exact discrete percentile with two hash
aggregations instead:

1. ``groupBy(group, value).count()`` — a hash agg with map-side combine;
   output cardinality is the number of DISTINCT values per group (domain-
   bounded, e.g. integer cents of a bounded price column), not row count.
2. A cumulative sum over the per-group distinct values (window ordered by
   value — the sort is over the distinct-value domain, not the rows) and a
   final hash agg that selects, per requested fraction p, the smallest
   value whose cumulative count reaches coverage
   (``cum * p_denom >= p_num * total`` in exact integer arithmetic).

That matches ``percentile_disc``'s definition — smallest value with
cumulative distribution >= p — bit-for-bit, while every stage has map-side
partials or domain-bounded state. Reference parity: the reference engine
has no distributed percentile at all (single-node JDBC aggregation); this
is the Spark-native scale form of the same profiling report
(DbImportWorker.java result statistics).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def value_counts(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Per-group value histogram: ``group_cols + [__v, __cnt]``.

    NULL values are dropped — ``percentile_disc`` ignores them (they count
    toward neither the numerator nor the total).
    """
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def percentiles_from_counts(
    counts: DataFrame,
    group_cols: Sequence[str],
    fractions: Sequence[tuple[str, int, int]],
    extra: Sequence[Column] = (),
) -> DataFrame:
    """Exact discrete percentiles from a ``value_counts`` histogram.

    ``fractions`` is a list of ``(out_name, p_num, p_denom)`` — e.g.
    ``("p95", 95, 100)`` — kept as integer ratios so the threshold test
    ``cum * p_denom >= p_num * total`` is exact (no float boundary drift
    against a DuckDB ``quantile_disc`` oracle).

    ``extra`` aggregates run in the same final hash agg over the histogram
    rows (columns available: ``__v``, ``__cnt``, plus ``__total`` = group
    row count), e.g. ``F.min("__v").alias("min_v")`` or
    ``F.sum(F.col("__v") * F.col("__cnt")).alias("sum_v")``.

    Returns one row per group: ``group_cols + [<out_name>...] + n_rows +
    [<extra>...]`` where ``n_rows`` is the group's non-null value count.
    """
    gcols = list(group_cols)
    # Both frames share one partition+order spec so they evaluate in a
    # single WindowExec pass (an unordered total-window would plan a second
    # Window node over the same sort).
    ordered = Window.partitionBy(*gcols).orderBy("__v")
    w = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wg = ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = counts.select(
        *gcols,
        "__v",
        "__cnt",
        F.sum("__cnt").over(w).alias("__cum"),
        F.sum("__cnt").over(wg).alias("__total"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cum") * F.lit(p_den) >= F.lit(p_num) * F.col("__total"),
                F.col("__v"),
            )
        ).alias(name)
        for name, p_num, p_den in fractions
    ]
    aggs.append(F.max("__total").alias("n_rows"))
    aggs.extend(extra)
    return cum.groupBy(*gcols).agg(*aggs)


def bucket_count_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    fractions: Sequence[tuple[str, int, int]],
) -> DataFrame:
    """Convenience wrapper: ``percentiles_from_counts(value_counts(...))``."""
    return percentiles_from_counts(
        value_counts(df, group_cols, value_col), group_cols, fractions
    )
