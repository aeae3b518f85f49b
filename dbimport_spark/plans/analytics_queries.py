"""Analytical / scale-pipeline queries with DuckDB oracles.

These go beyond the reference's own operator surface (which has no general
aggregates — SURVEY.md §2.4) to cover the headline-bench shapes a 100 TB
engine must handle: wide aggregation (Q1), top-k per group, sessionization,
event-time windowed aggregation, and an as-of join.

Float discipline: every SUM over doubles is computed over exact integer
cents (``round(x * 100)::bigint``) so Spark and DuckDB sums are
bit-identical regardless of accumulation order; ratios divide the same
exact integers in the same written order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbimport_spark.functions.quantile import (
    bucket_count_percentiles,
    percentiles_from_counts,
    value_counts,
)
from dbimport_spark.plans.registry import load, load_events, register


@register(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_charge,
       CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT) / 10000.0 / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter (pushed to parquet) → hash agg with
    map-side combine. The flagship bench query."""
    l = load(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100).cast("bigint")
    base_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    charge_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100
    ).cast("bigint")
    dpct_c = F.round(F.col("l_discount") * 10000).cast("bigint")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(base_c) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(disc_c) / F.lit(100.0)).alias("sum_disc_price"),
            (F.sum(charge_c) / F.lit(100.0)).alias("sum_charge"),
            (F.sum(dpct_c) / F.lit(10000.0) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "topk_orders_per_customer",
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders)
WHERE rnk <= 3""",
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: window row_number ≤ K. At scale the per-group sort
    is bounded by group size; no global sort."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "events_window_agg",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_value
FROM events
GROUP BY 1, 2""",
)
def events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation — the batch expression of the
    Structured Streaming plan (same F.window + agg runs on readStream with
    a watermark; see dbimport_spark/streaming)."""
    e = load_events(spark, sf_dir)
    cents = F.round(F.col("value") * 10000).cast("bigint")
    return (
        e.groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / F.lit(10000.0)).alias("sum_value"),
        )
    )


@register(
    "events_sessionize",
    """WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY user_id, session_id""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + cumulative sum over a
    per-user window, then per-session aggregation. The classic batch
    equivalent of streaming session_window(ts, gap)."""
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1800 * 1000 * 1000), 1).otherwise(0)
    sess = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        e.select("user_id", "ts", "event_id")
        .withColumn("session_id", sess.cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@register(
    "asof_join_events_orders",
    """SELECT e.event_id, e.user_id, e.ts,
       (SELECT o.o_orderkey FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS last_orderkey
FROM events e""",
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — SNIPPETS.md pattern): union the
    two streams tagged, one per-key window pass, last_value(ignore nulls).

    Scale: a single shuffle on the join key + a per-key sort — the same cost
    profile as a sort-merge join; never a per-row probe. The oracle is a
    correlated LIMIT 1 subquery with identical tie-breaking
    (max (o_orderdate, o_orderkey) among o_orderdate <= ts).
    """
    e = load_events(spark, sf_dir)
    o = load(spark, sf_dir, "orders")
    orders_side = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("tag"),
        F.col("o_orderkey").alias("okey"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    events_side = e.select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("bigint").alias("okey"),
        F.col("event_id"),
    )
    unioned = orders_side.unionByName(events_side)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("tag"), F.col("okey").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_last = unioned.withColumn("last_orderkey", F.last("okey", ignorenulls=True).over(w))
    return with_last.filter(F.col("tag") == 1).select("event_id", "user_id", "ts", "last_orderkey")


@register(
    "skew_salted_join",
    """SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o_orderpriority""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join: the fact side is salted (content-derived,
    deterministic), the dim side replicated per salt bucket, so a hot
    orderkey splits across salt_buckets tasks. Salting is
    correctness-invariant — this oracle is the plain unsalted join."""
    from dbimport_spark.operators import skew

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = skew.salted_join(l, o, ["l_orderkey"], salt_buckets=8)
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.sum(cents) / F.lit(100.0)).alias("sum_price"),
    )


@register(
    "skew_salted_agg",
    """SELECT l_returnflag, count(*) AS n_items,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
       CAST(max(l_extendedprice) AS DOUBLE) AS max_price
FROM lineitem GROUP BY l_returnflag""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys (l_returnflag
    has only 3 values — maximal skew): phase 1 aggregates (key, salt),
    phase 2 combines. Result equals the direct aggregation exactly."""
    from dbimport_spark.operators import skew

    l = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_cents"),
        "l_extendedprice",
    )
    return skew.salted_aggregate(
        l,
        ["l_returnflag"],
        {
            "n_items": ("l_returnflag", "count"),
            "qty_cents": ("qty_cents", "sum"),
            "max_price": ("l_extendedprice", "max"),
        },
        salt_buckets=8,
    )


@register(
    "broadcast_dim_join",
    """SELECT p_brand, count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p_brand""",
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact×dim join with an explicit broadcast hint: the part dimension
    ships to every task, the lineitem scan stays shuffle-free until the
    final small aggregation — the canonical 100 TB fact-table join shape
    (dim tables are MBs; broadcasting avoids shuffling the TB fact side).
    """
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(cents) / F.lit(100.0)).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# range_join_binned — non-equi temporal self-join via bin bucketing

_RANGE_T_US = 300 * 1000 * 1000  # 5-minute pairing radius


@register(
    "range_join_binned",
    f"""WITH err AS (
  SELECT event_id, epoch_us(ts) AS us FROM events WHERE event_type = 'error'
)
SELECT a.event_id AS a_id, b.event_id AS b_id, b.us - a.us AS dt_us
FROM err a JOIN err b
ON a.event_id < b.event_id AND abs(a.us - b.us) <= {_RANGE_T_US}""",
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs of 'error' events within 5 minutes of each other — a pure
    range (non-equi) join with NO equi key. Naively this is a cartesian
    product; the scale-correct plan BINS time into radius-sized buckets
    and equi-joins on the bin: one side keeps its bin, the other is
    replicated to (bin-1, bin, bin+1), so every qualifying pair shares
    exactly one join key (the left row's bin matches exactly one of the
    right row's three replicas — no post-dedup needed) and the shuffle is
    a plain hash partition on bin. Cost: 3x replication of one side
    instead of |L|x|R|; within-bucket pairs are filtered by the exact
    predicate. Same technique Databricks ships as range-join bin hints.

    The oracle is the naive quadratic join — fine at sf0.01, which is the
    point: the oracle states WHAT, the bins are the HOW that survives
    100 TB.
    """
    e = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select("event_id", F.unix_micros(F.col("ts")).alias("us"))
    )
    bin_c = F.floor(F.col("us") / F.lit(_RANGE_T_US))
    left = e.select(
        F.col("event_id").alias("a_id"), F.col("us").alias("a_us"), bin_c.alias("bin")
    )
    right = e.select(
        F.col("event_id").alias("b_id"),
        F.col("us").alias("b_us"),
        F.explode(F.array(bin_c - 1, bin_c, bin_c + 1)).alias("bin"),
    )
    return (
        left.join(right, "bin")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_us") - F.col("b_us")) <= _RANGE_T_US)
        )
        .select("a_id", "b_id", (F.col("b_us") - F.col("a_us")).alias("dt_us"))
    )


# ---------------------------------------------------------------------------
# numeric_profile — per-group distribution profile (exact discrete quantiles)


@register(
    "numeric_profile",
    """SELECT l_returnflag, count(*) AS n_rows,
       min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_cents,
       max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS max_cents,
       quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS p50_cents,
       quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.95) AS p95_cents,
       quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.99) AS p99_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_price
FROM lineitem GROUP BY l_returnflag""",
)
def numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column distribution profiling (the data-quality sibling of
    schema/infer.py's type lattice): per-group row count, min/max, exact
    discrete percentiles and mean over integer cents.

    Scale: exact percentiles via bucket counting (functions/quantile.py) —
    count per (group, cents) hash agg with map-side combine, cumulative
    sum over the DISTINCT-cents domain, threshold select. No per-group
    row-sort buffer anywhere: the old percentile_disc plan pulled every
    row of a group into one task (3 groups × all of lineitem — an OOM at
    100 TB); this plan's state is bounded by the cents DOMAIN (~1M values
    for TPC-H prices), not row count. min/max/sum/count ride the same
    histogram, so lineitem is scanned ONCE. Matches percentile_disc —
    smallest value with cume_dist >= p — bit-for-bit (and the DuckDB
    quantile_disc oracle, verified)."""
    l = load(spark, sf_dir, "lineitem")
    cents = l.select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    counts = value_counts(cents, ["l_returnflag"], "cents")
    prof = percentiles_from_counts(
        counts,
        ["l_returnflag"],
        [("p50_cents", 1, 2), ("p95_cents", 95, 100), ("p99_cents", 99, 100)],
        extra=[
            F.min("__v").alias("min_cents"),
            F.max("__v").alias("max_cents"),
            F.sum(F.col("__v") * F.col("__cnt")).alias("__sum_cents"),
        ],
    )
    return prof.select(
        "l_returnflag",
        "n_rows",
        "min_cents",
        "max_cents",
        "p50_cents",
        "p95_cents",
        "p99_cents",
        F.expr("__sum_cents / CAST(100.0 AS DOUBLE) / n_rows").alias("avg_price"),
    )


@register(
    "rollup_order_totals",
    """SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
)
def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in one pass: GROUP BY ROLLUP (priority → status
    → grand total). Spark expands the grouping sets inside a single
    Expand+hash-agg — one shuffle for all three levels, with map-side
    partials; at 100 TB this replaces three separate groupBy jobs.
    grouping_id disambiguates NULL-as-data from NULL-as-total."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents) / F.lit(100.0)).alias("sum_price"),
        )
        .select("o_orderpriority", "o_orderstatus", "gid", "n_orders", "sum_price")
    )


@register(
    "orders_running_balance",
    """SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0
         AS running_spend,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS order_seq
FROM orders""",
)
def orders_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-customer spend: running-frame window sum over exact
    cents + order sequence number. One shuffle on the partition key; the
    per-group running frame is computed in a single sorted pass bounded by
    group size (no global sort, no self-join)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    running = (
        F.sum(cents)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        / F.lit(100.0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        running.alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "approx_distinct_gate",
    """SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS n_orders_exact,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag""",
)
def approx_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ accuracy gate: per group, the exact distinct count
    plus a boolean asserting approx_count_distinct (rsd 2%) lands within
    10× that rsd of exact — same gating pattern as the ANN recall queries
    (the oracle can't run Spark's HLL, but it CAN assert the sketch isn't
    broken). At 100 TB the approx twin is the one to run: a fixed-size
    mergeable sketch per group vs exact distinct's full key shuffle.

    Plan note: the exact count runs as a TWO-PHASE distinct — pre-aggregate
    on (group, key) with map-side partial dedup, then count per group —
    joined to a separate HLL agg. Measured 1.8× faster at sf0.1 than the
    single groupBy(countDistinct + approx) form, which plans an Expand that
    doubles every input row before aggregating."""
    l = load(spark, sf_dir, "lineitem")
    exact = (
        l.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_orders_exact"))
    )
    approx = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("__approx")
    )
    return exact.join(approx, "l_returnflag").select(
        "l_returnflag",
        "n_orders_exact",
        (
            F.abs(F.col("__approx") - F.col("n_orders_exact"))
            <= 0.2 * F.col("n_orders_exact")
        ).alias("approx_ok"),
    )


@register(
    "q3_shipping_priority",
    """SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter (BUILDING segment) broadcast
    into a 3-way join, then hash agg on the fact key. The segment filter
    and both date filters push to the parquet scans; customer is
    explicitly broadcast (a filtered dim, ~1/5 of customers) so the
    orders⋈customer side never shuffles — only the lineitem⋈orders join
    shuffles, on the shared orderkey."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-06-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-01 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (
        l.join(
            o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_c) / F.lit(100.0)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_region_revenue",
    """SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue per nation in one region.
    region→nation→(customer, supplier) are all broadcast dims; the only
    shuffles are the two fact joins (orders⋈customer-side on custkey,
    lineitem⋈orders on orderkey) and the final 5-row hash agg. The
    s_nationkey = c_nationkey 'local supplier' condition is applied as a
    post-join filter on two broadcast columns — no extra shuffle."""
    nr = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (
        l.join(o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg((F.sum(rev_c) / F.lit(100.0)).alias("revenue"))
    )


@register(
    "pivot_priority_status",
    """SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            FILTER (WHERE o_orderstatus = 'F') AS BIGINT) / 100.0 AS price_f
FROM orders GROUP BY o_orderpriority""",
)
def pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): order counts per priority spread across status
    columns, plus a pivoted cents-exact sum. Spark's pivot with an
    EXPLICIT value list compiles to a single hash agg of conditional
    aggregates — one shuffle, no per-value scans (an unlisted-value pivot
    would need an extra distinct pass to discover columns; always list
    values at scale)."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_p"),
            (
                F.sum(F.when(F.col("o_orderstatus") == "F", cents)).cast("bigint")
                / F.lit(100.0)
            ).alias("price_f"),
        )
    )


@register(
    "doc_length_deciles",
    """SELECT doc_id, lang,
       CAST(ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS INT) AS decile
FROM documents""",
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length deciles (ntile): the bucketing step of a
    length-balanced sampler. Partitioned by lang so each window sort is
    per-group (no global single-partition sort); the doc_id tiebreak makes
    bucket assignment deterministic. At 100 TB with giant groups the
    drop-in is approx-quantile cutpoints + a join, trading exactness for
    a bounded sort."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id", "lang", F.ntile(10).over(w).cast("int").alias("decile")
    )


@register(
    "events_gap_stats",
    """WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           AS gap_us
  FROM events
)
SELECT user_id, count(*) AS n_gaps,
       max(gap_us) AS max_gap_us,
       quantile_disc(gap_us, 0.5) AS p50_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY user_id""",
)
def events_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap profiling per user (lag window → hash agg): the
    feed-health/session-tuning companion to sessionize. One shuffle on
    user_id feeds both the window and the aggregation (same key → AQE
    reuses the exchange); exact discrete median over integer micros."""
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        e.select("user_id", gap.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.max("gap_us").alias("max_gap_us"),
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us) AS BIGINT)"
            ).alias("p50_gap_us"),
        )
    )


@register(
    "dq_audit_orders",
    """SELECT 'orphan_custkey' AS check_name,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
       AS violations
UNION ALL
SELECT 'dup_orderkey',
       (SELECT CAST(COALESCE(sum(n - 1), 0) AS BIGINT) FROM
         (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1) d)
UNION ALL
SELECT 'null_priority', (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL)
UNION ALL
SELECT 'nonpositive_price', (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
UNION ALL
SELECT 'date_out_of_range',
       (SELECT count(*) FROM orders
        WHERE o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
           OR o_orderdate >= TIMESTAMP '2005-01-01 00:00:00')""",
)
def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: named constraint checks (referential integrity
    via anti-join, key uniqueness via a having-count agg, nullability and
    range scans) reported as one (check_name, violations) table — the
    validation report a production import runs before committing a batch
    (the set-based generalization of the reference's per-row validity
    checks, DbImportWorker.java:1502-1566).

    Scale: every check is an independent aggregation over a pruned scan;
    the anti-join shuffles on the key, everything else is map-side
    partials into 1-row aggs. Checks share the orders scan via Spark's
    file-scan reuse; a 100 TB audit would fuse the single-table checks
    into one pass (count_if per predicate) — kept separate here for
    clarity, and the fused form is what q1-style conditional aggs show
    elsewhere."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")

    def row(name, agg_df):
        return agg_df.select(F.lit(name).alias("check_name"), F.col("violations"))

    orphan = row(
        "orphan_custkey",
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti").agg(
            F.count(F.lit(1)).alias("violations")
        ),
    )
    dup = row(
        "dup_orderkey",
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("violations")),
    )
    nullp = row(
        "null_priority",
        o.agg(F.count(F.when(F.col("o_orderpriority").isNull(), 1)).alias("violations")),
    )
    price = row(
        "nonpositive_price",
        o.agg(F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("violations")),
    )
    dates = row(
        "date_out_of_range",
        o.agg(
            F.count(
                F.when(
                    (F.col("o_orderdate") < F.lit("1990-01-01 00:00:00").cast("timestamp"))
                    | (F.col("o_orderdate") >= F.lit("2005-01-01 00:00:00").cast("timestamp")),
                    1,
                )
            ).alias("violations")
        ),
    )
    return orphan.unionByName(dup).unionByName(nullp).unionByName(price).unionByName(dates)


@register(
    "price_histogram",
    """SELECT l_returnflag,
       CAST(least(19, CAST(round(l_extendedprice * 100) AS BIGINT) // 50000) AS INT) AS bucket,
       count(*) AS n_rows
FROM lineitem GROUP BY 1, 2""",
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per group (bucket = cents div 50000, capped at
    19 — a 20-bin $500-wide histogram): the distribution-sketch that ships
    with every profiling pass. One hash agg on (group, bucket) with
    map-side combine; bucket boundaries are integer arithmetic so both
    engines bin identically."""
    l = load(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.lit(19).cast("bigint"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 50000"),
    ).cast("int")
    return (
        l.groupBy("l_returnflag", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "approx_quantile_gate",
    """SELECT l_returnflag,
       quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS p50_exact_cents,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag""",
)
def approx_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile accuracy gate (the percentile sibling of
    approx_distinct_gate): per group, the exact discrete median plus a
    boolean asserting percentile_approx (accuracy 10000) lands within 1%
    of it. At 100 TB the approx form is the everyday one — a fixed-size
    mergeable sketch per group; this gate is what lets you trust that
    swap.

    Scale: the exact side uses bucket-count percentiles
    (functions/quantile.py — hash aggs + a distinct-cents cumulative
    window, no per-group row-sort buffer), so even the GATE itself
    survives 3-groups × 20M-rows skew; the approx side is Spark's
    mergeable percentile_approx sketch. The two 3-row aggregates meet in
    a broadcast join."""
    l = load(spark, sf_dir, "lineitem")
    cents_df = l.select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    exact = bucket_count_percentiles(
        cents_df, ["l_returnflag"], "cents", [("p50_exact_cents", 1, 2)]
    ).select("l_returnflag", "p50_exact_cents")
    approx = l.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_approx(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5, 10000)"
        ).alias("__approx")
    )
    return exact.join(F.broadcast(approx), "l_returnflag").select(
        "l_returnflag",
        "p50_exact_cents",
        (
            F.abs(F.col("__approx") - F.col("p50_exact_cents"))
            <= 0.01 * F.col("p50_exact_cents")
        ).alias("approx_ok"),
    )


@register(
    "user_value_trend",
    """WITH p AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 60000000 AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM p GROUP BY user_id
)
SELECT user_id, n,
       n * sxy - sx * sy AS num,
       n * sxx - sx * sx AS den,
       CAST(n * sxy - sx * sy AS DOUBLE) / nullif(n * sxx - sx * sx, 0) AS slope_cents_per_min
FROM s""",
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of event value over time — a model fit
    as a PURE AGGREGATION: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) from five
    sufficient statistics in one hash agg (map-side combined, one shuffle
    on user_id, no window, no per-group iteration). x is integer minutes
    since the corpus epoch and y integer cents, so every sum fits a
    BIGINT exactly and the only float op is one final division of
    identical integers — bit-stable across engines and partitionings.
    This sufficient-statistics shape is how regression/covariance/OLS run
    at 100 TB: the model state is O(groups), never O(rows)."""
    e = load_events(spark, sf_dir)
    epoch0 = "unix_micros(TIMESTAMP '2024-01-01 00:00:00')"
    p = e.select(
        "user_id",
        F.expr(f"(unix_micros(ts) - {epoch0}) div 60000000").alias("x"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("y"),
    )
    s = p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "user_id",
        "n",
        num.alias("num"),
        den.alias("den"),
        (num.cast("double") / F.nullif(den, F.lit(0))).alias("slope_cents_per_min"),
    )


@register(
    "set_ops_customers",
    """WITH big AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM big INTERSECT SELECT c_custkey FROM building) a
UNION ALL
SELECT 'except', c_custkey FROM (SELECT c_custkey FROM big EXCEPT SELECT c_custkey FROM building) b
UNION ALL
SELECT 'union_distinct', c_custkey FROM (SELECT c_custkey FROM big UNION SELECT c_custkey FROM building) c""",
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set operations (INTERSECT / EXCEPT / UNION DISTINCT)
    over two derived key sets, tagged into one result. The reference has
    no set operators (SURVEY §2.7) — this covers the gap a SQL user
    expects an engine to have. Spark plans each as a distinct-aggregated
    join/anti-join on the key; all three share the same two pruned scans."""
    c = load(spark, sf_dir, "customer")
    big = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    parts = [
        big.intersect(building).select(F.lit("intersect").alias("op"), "c_custkey"),
        big.exceptAll(building).distinct().select(F.lit("except").alias("op"), "c_custkey"),
        big.union(building).distinct().select(
            F.lit("union_distinct").alias("op"), "c_custkey"
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# zorder_cluster — Morton-key clustering for multi-column data skipping

from dbimport_spark.functions.zorder import interleave_sql as _interleave_sql
from dbimport_spark.functions.zorder import z_value as _z_value


@register(
    "zorder_cluster",
    f"""SELECT o_orderkey,
       {_interleave_sql('o_custkey', 'dayofyear(o_orderdate)')} AS zval
FROM orders""",
)
def zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, day-of-year) — the
    multi-column data-skipping layout Delta/Iceberg expose as OPTIMIZE
    ZORDER BY, as plain DataFrame ops (functions/zorder.py): interleave
    the two dimensions' bits into one bigint, range-partition + sort by
    it, and every written file covers a small rectangle of the 2-D space,
    so parquet min/max stats prune on EITHER column
    (test_zorder_write_files_cover_rectangles proves the rectangles on
    real footers). The graded surface is the key itself: a flat OR of
    per-bit shifts, bit-identical in DuckDB — pure projection, no
    shuffle, no UDF."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        _z_value("o_custkey", "dayofyear(o_orderdate)").alias("zval"),
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@register(
    "table_profile_orders",
    "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       CAST(count(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS ndv
FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style whole-table column profile — null count and EXACT
    distinct count for every column of orders, the statistics a
    cost-based optimizer (or a data-quality dashboard) collects before
    planning joins. ONE aggregation pass over the table: Spark plans
    the multi-distinct aggregate with a single Expand (each input row
    fans out once per column), so the scan happens once however many
    columns are profiled — the right shape at 100 TB, where per-column
    ANALYZE loops re-scan the table N times. The single stats row is
    then unpivoted to (col_name, n_null, ndv) rows driver-free via an
    inline struct-array explode. The reference's gatherTableStats
    (DbImportWorker.java) is the single-node ancestor of this shape."""
    o = load(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).cast("bigint").alias(f"nn_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"nd_{c}"))
    row = o.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"nn_{c}").alias("n_null"),
                        F.col(f"nd_{c}").alias("ndv"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.col_name", "s.n_null", "s.ndv")
