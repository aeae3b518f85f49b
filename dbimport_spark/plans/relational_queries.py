"""Relational plan shapes round 2: correlated-subquery TPC-H forms and
event-analytics (funnel, retention) with DuckDB oracles.

The reference engine's query surface is import-shaped (SURVEY.md §2), but a
drop-in analytics engine must also handle the decorrelated-subquery join
shapes every warehouse workload leans on: EXISTS semi-joins (Q4), NOT-IN
anti-joins with distinct aggregation (Q16), HAVING-subquery semi-joins
(Q18), and the "exactly one of the group qualifies" double-correlation
(Q21).  Each is expressed declaratively so Catalyst plans the semi/anti
join itself — no manual decorrelation, no collect.

Float discipline matches analytics_queries: sums over doubles run on exact
integer cents; passthrough doubles are compared verbatim (same parquet
bits on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.plans.registry import load, load_events, register


@register(
    "q4_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: no l_commitdate/l_receiptdate in this
    schema, so "late" = shipped >60 days after order date): per-priority
    count of orders with at least one late lineitem, via an EXISTS
    semi-join.

    Plan: the quarter filter pushes to the orders scan (~1/28 of rows);
    the semi-join is an equi-join on orderkey with the late predicate as a
    join-side filter — Catalyst keeps it LeftSemi, so each order is
    emitted at most once and no duplicate-elimination shuffle is needed.
    At 100 TB both sides shuffle once on orderkey (or the filtered orders
    side broadcasts under AQE); the 5-row agg is a map-side partial."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q16_supplier_variety",
    """SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#9'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size""",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: no partsupp table here, so supplier
    variety is counted from lineitem; the "customer complaints" NOT IN
    becomes suppliers with negative account balance): distinct-supplier
    count per qualifying (brand, type, size).

    Plan: part is a filtered broadcast dim; the NOT IN decorrelates to a
    broadcast left-anti join against a ~handful of excluded suppliers
    (NULL-free key, so anti-join semantics are safe); the only shuffle is
    the final partial_count(distinct) agg — Spark plans distinct
    aggregation as a two-phase expand/agg that keeps map-side partials."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q18_large_orders",
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS total_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING-subquery → semi-join), re-aggregated with customer detail.

    Plan: the HAVING aggregate runs once over lineitem (one shuffle on
    orderkey, map-side partials); its survivors are a tiny key set that
    broadcasts into the semi-join, so the main lineitem pass shuffles only
    for its own orderkey agg. customer is a broadcast dim. Quantities sum
    as exact integer cents (l_quantity is double in this schema)."""
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty_c = F.round(F.col("l_quantity") * 100).cast("bigint")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(qty_c).alias("q"))
        .filter(F.col("q") > 30000)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .join(
            o.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg((F.sum(qty_c).cast("bigint") / F.lit(100.0)).alias("total_qty"))
    )


@register(
    "q21_waiting_supplier",
    """WITH o_sup AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY l_orderkey, l_suppkey
), ord AS (
  SELECT l_orderkey,
         count(*) AS n_sup,
         sum(is_late) AS n_late
  FROM o_sup GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM o_sup
JOIN ord USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE is_late = 1 AND n_sup >= 2 AND n_late = 1
GROUP BY s_name""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "kept the order waiting" = shipped >90
    days after order date): suppliers who were the ONLY late supplier on a
    multi-supplier order — the classic EXISTS + NOT EXISTS double
    correlation, decorrelated into two stacked aggregations instead of two
    self-joins.

    Plan: one shuffle on (orderkey, suppkey) for the per-supplier late
    flag, one map-side-partial re-agg to per-order counts on the same key
    prefix (no new shuffle domain), then a join back on orderkey that AQE
    sizes (the per-order side is output-small). supplier is a broadcast
    dim. This is strictly fewer passes over lineitem than the textbook
    double-EXISTS plan and has no correlated per-row probe."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), 1
    ).otherwise(0)
    o_sup = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    ord_stats = o_sup.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_sup"), F.sum("is_late").alias("n_late")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        o_sup.join(ord_stats, "l_orderkey")
        .filter((F.col("is_late") == 1) & (F.col("n_sup") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "events_funnel",
    """WITH f AS (
  SELECT user_id, min(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(ts) AS t_click
  FROM events e JOIN f USING (user_id)
  WHERE event_type = 'click' AND ts > t_view
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(ts) AS t_purchase
  FROM events e JOIN s2 USING (user_id)
  WHERE event_type = 'purchase' AND ts > t_click
  GROUP BY e.user_id
)
SELECT 'view' AS stage, count(*) AS users FROM f
UNION ALL
SELECT 'view>click' AS stage, count(*) AS users FROM s2
UNION ALL
SELECT 'view>click>purchase' AS stage, count(*) AS users FROM s3""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: users reaching view → click-after-view →
    purchase-after-that-click (strictly increasing event time, anchored at
    the user's EARLIEST view, then earliest qualifying click, etc.).

    Spark plan: ONE shuffle — collect each user's (ts, type) pairs sorted,
    then a single aggregate() fold walks the timeline tracking the
    furthest stage reached. The oracle decorrelates the same semantics
    into three chained min-aggregations (each stage keyed to the previous
    stage's timestamp). At 100 TB the fold shape wins: three
    self-join+agg passes over the event log collapse into one
    shuffle + per-user linear walk, and the per-user state is 3
    timestamps, not the event list (the sorted array is transient within
    the aggregation buffer of each user).

    Reference scope note: the reference has no event analytics at all —
    this is scale-pipeline surface, cited to SURVEY.md §2 'beyond'."""
    e = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    per_user = e.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
    )
    # Fold state: (t_view, t_click, t_purchase) as nullable timestamps.
    fold = F.aggregate(
        F.col("evs"),
        F.struct(
            F.lit(None).cast("timestamp").alias("tv"),
            F.lit(None).cast("timestamp").alias("tc"),
            F.lit(None).cast("timestamp").alias("tp"),
        ),
        lambda acc, ev: F.struct(
            F.when(
                acc["tv"].isNull() & (ev["event_type"] == "view"), ev["ts"]
            ).otherwise(acc["tv"]).alias("tv"),
            F.when(
                acc["tc"].isNull()
                & (ev["event_type"] == "click")
                & acc["tv"].isNotNull()
                & (ev["ts"] > acc["tv"]),
                ev["ts"],
            ).otherwise(acc["tc"]).alias("tc"),
            F.when(
                acc["tp"].isNull()
                & (ev["event_type"] == "purchase")
                & acc["tc"].isNotNull()
                & (ev["ts"] > acc["tc"]),
                ev["ts"],
            ).otherwise(acc["tp"]).alias("tp"),
        ),
    )
    st = per_user.select(fold.alias("st")).select("st.tv", "st.tc", "st.tp")
    counts = st.agg(
        F.count("tv").alias("n1"), F.count("tc").alias("n2"), F.count("tp").alias("n3")
    )
    return counts.select(
        F.explode(
            F.array(
                F.struct(F.lit("view").alias("stage"), F.col("n1").alias("users")),
                F.struct(F.lit("view>click").alias("stage"), F.col("n2").alias("users")),
                F.struct(
                    F.lit("view>click>purchase").alias("stage"),
                    F.col("n3").alias("users"),
                ),
            )
        ).alias("s")
    ).select("s.stage", "s.users")


@register(
    "events_retention_cohorts",
    """WITH c AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events
)
SELECT cohort_week,
       CAST((act_week - cohort_week) / 7 AS BIGINT) AS week_offset,
       count(*) AS users
FROM a JOIN c USING (user_id)
GROUP BY cohort_week, week_offset""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen ISO week,
    counted in each subsequent week of activity (classic growth-analytics
    triangle).

    Plan: one shuffle on user_id computes BOTH the cohort week (min ts)
    and the distinct activity weeks (collect_set of truncated weeks) in a
    single aggregation — the oracle's two-pass join shape collapses into
    one pass + explode. The final (cohort, offset) agg is a ~25-row
    map-side partial. Monday-start date_trunc('week') semantics agree
    between Spark and DuckDB."""
    e = load_events(spark, sf_dir).select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk")
    )
    per_user = e.groupBy("user_id").agg(
        F.min("wk").alias("cohort_week"), F.collect_set("wk").alias("weeks")
    )
    return (
        per_user.select(
            "cohort_week", F.explode("weeks").alias("act_week")
        )
        .select(
            "cohort_week",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )


@register(
    "q2_min_cost_supplier",
    """WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), mn AS (
  SELECT l_partkey, min(s_acctbal) AS min_bal
  FROM ps JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY l_partkey
)
SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal
FROM part
JOIN ps ON l_partkey = p_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN mn ON mn.l_partkey = p_partkey AND s_acctbal = min_bal
WHERE p_size <= 5""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp/supplycost, so "cheapest
    supplier" = lowest account balance among suppliers that shipped the
    part): the correlated scalar-MIN subquery, decorrelated into an
    aggregate + join-back. Ties on the min keep all tied suppliers —
    same set semantics both engines.

    Plan: the distinct part→supplier pair set is computed once (one
    shuffle) and reused for both the min-aggregate and the final probe —
    Spark caches nothing here, but both consumers share the same scan +
    exchange via reused-exchange. supplier and the per-part min table
    broadcast; the p_size filter pushes into the part scan."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    pssup = ps.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    mn = (
        pssup.groupBy("l_partkey")
        .agg(F.min("s_acctbal").alias("min_bal"))
        .withColumnRenamed("l_partkey", "mn_partkey")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select(
        "p_partkey", "p_brand"
    )
    return (
        pssup.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            mn,
            (F.col("l_partkey") == F.col("mn_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "q22_idle_rich_customers",
    """WITH stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS tot
  FROM customer WHERE c_acctbal > 0
), cand AS (
  SELECT c_mktsegment, c_acctbal
  FROM customer, stats
  WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > tot
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
)
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS totacctbal
FROM cand GROUP BY c_mktsegment""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no RECENT orders (global-counts-scalar subquery + NOT EXISTS
    anti-join; "recent" because this generator gives every customer at
    least one lifetime order, which would make the textbook predicate
    vacuously empty).
    The average comparison is cross-multiplied into exact integer cents
    (bal·n > total) so no float average ever exists on either engine.

    Plan: the stats scalar is a 1-row broadcast cross join; the NOT
    EXISTS decorrelates to a left-anti join against the orders key
    projection — at 100 TB that anti join shuffles on custkey unless
    AQE proves the filtered candidate side broadcastable; either way no
    correlated per-row probe survives."""
    cust = load(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents).cast("bigint").alias("tot")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    cand = (
        cust.crossJoin(F.broadcast(stats))
        .filter(cents * F.col("n") > F.col("tot"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return cand.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        (F.sum(cents).cast("bigint") / F.lit(100.0)).alias("totacctbal"),
    )


@register(
    "events_resample_ffill",
    """WITH bounds AS (
  SELECT user_id,
         date_trunc('hour', min(ts)) AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM events WHERE user_id % 10 = 0 GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
), hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_fp
  FROM events WHERE user_id % 10 = 0 GROUP BY user_id, date_trunc('hour', ts)
)
SELECT g.user_id, g.hour,
       last_value(h.v_fp IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0
         AS value_ffill,
       h.v_fp IS NOT NULL AS observed
FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hour = g.hour""",
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to an hourly grid with forward-fill (LOCF)
    — the gap-filling step of feature engineering over irregular event
    streams. Each user's [first, last] hour range is densified via
    sequence() + explode, observed hours carry the hour's summed value
    (exact 1e-4 fixed-point), and gaps inherit the last observation via
    an IGNORE NULLS last_value window.

    Scale notes: the grid explode is map-only after one per-user bounds
    agg; the fill window sorts within user partitions only (no global
    sort), and grid size is bounded by span/granularity per key — the
    explicit-grid + LOCF-window shape every warehouse uses. The user
    slice (1 in 10) keeps the graded output compact; the plan is
    slice-independent."""
    e = load_events(spark, sf_dir).filter(F.col("user_id") % 10 == 0)
    hourly = (
        e.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(
            F.sum(F.round(F.col("value") * 10000).cast("bigint")).alias("v_fp")
        )
    )
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    return joined.select(
        "user_id",
        "hour",
        (F.last("v_fp", ignorenulls=True).over(w) / F.lit(10000.0)).alias(
            "value_ffill"
        ),
        F.col("v_fp").isNotNull().alias("observed"),
    )


@register(
    "outlier_orders_zscore",
    """WITH c AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), st AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         CAST(sum(cents * cents) AS HUGEINT) AS ss
  FROM c GROUP BY o_orderpriority
)
SELECT o_orderkey, c.o_orderpriority, cents
FROM c JOIN st ON c.o_orderpriority = st.o_orderpriority
WHERE 100 * CAST(n * cents - s AS HUGEINT) * CAST(n * cents - s AS HUGEINT)
      > 289 * (n * ss - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))""",
)
def outlier_orders_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flags (|x − μ| > 1.7σ) computed ENTIRELY in
    exact integer arithmetic — the data-quality screening step of an
    import pipeline, with the float mean/stddev eliminated by
    cross-multiplication: |x−μ|>kσ ⇔ 100·(n·x−Σ)² > 100k²·(n·Σx²−Σ²)
    with k=1.7 (≈2% of this near-uniform price distribution; a 2σ cut is
    empty because uniform data never exceeds √3·σ). Spark
    carries the squares in DECIMAL(38,0) (≤1e26 here, far under the cap),
    DuckDB in HUGEINT; both sides are bit-exact so the flagged set is
    identical — no epsilon, no tie ambiguity at the threshold.

    Plan: one grouped sufficient-statistics agg (5 rows) broadcast back
    over the scan — two passes, no sort, no window; the shape that holds
    at any scale (same sufficient-statistics pattern as user_value_trend's
    regression)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    dec = lambda c: c.cast("decimal(38,0)")
    st = o.groupBy(F.col("o_orderpriority").alias("pr")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(dec(F.col("cents")) * dec(F.col("cents"))).alias("ss"),
    )
    dev = dec(F.col("n") * F.col("cents") - F.col("s"))
    var_n2 = dec(F.col("n")) * F.col("ss") - dec(F.col("s")) * dec(F.col("s"))
    return (
        o.join(F.broadcast(st), F.col("o_orderpriority") == F.col("pr"))
        .filter(
            F.lit(100).cast("decimal(38,0)") * dev * dev
            > F.lit(289).cast("decimal(38,0)") * var_n2
        )
        .select("o_orderkey", "o_orderpriority", "cents")
    )


@register(
    "events_props_json",
    """SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY event_type, k_bucket""",
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload processing: the events table carries a raw
    JSON ``props`` string (the reference's JSON import path,
    JsonDataProvider + dataPath, applied to an embedded column instead of
    a file); extract a typed field with the built-in JSON path reader and
    aggregate on it.

    Plan notes: ``get_json_object`` evaluates JVM-side inside codegen (no
    UDF, no shuffle beyond the final agg); at 100 TB the right long-term
    move is schema-on-write (from_json into a struct column at ingest) —
    this query is the schema-on-read form that makes that migration
    possible. Extraction runs once per row into a let-bound column, not
    once per reference."""
    e = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("kv"))
        .filter(F.col("kv").isNotNull())
        .groupBy("event_type", (F.col("kv") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("kv").cast("bigint").alias("sum_k"),
        )
    )


@register(
    "events_rolling_hour",
    """SELECT event_id, user_id, ts,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) OVER w AS BIGINT)
         AS win_sum_fp,
       CAST(count(*) OVER w AS BIGINT) AS win_n
FROM events
WHERE user_id % 10 = 3
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
)
def events_rolling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour window per user — the RANGE (time-interval) frame,
    as opposed to the ROWS frames used elsewhere (orders_running_balance):
    each event sees the exact fixed-point sum and count of its user's
    events in the preceding hour, peers-at-equal-timestamp included (both
    engines' RANGE semantics).

    Scale: the window sorts within user partitions only; frame evaluation
    is the streaming two-pointer pass over each sorted partition, O(rows)
    not O(rows·frame). A 1-in-10 user slice keeps graded output compact;
    the plan is slice-independent."""
    e = load_events(spark, sf_dir).filter(F.col("user_id") % 10 == 3)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    fp = F.round(F.col("value") * 10000).cast("bigint")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(fp).over(w).cast("bigint").alias("win_sum_fp"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("win_n"),
    )


@register(
    "cube_order_stats",
    """SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
         AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)""",
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 2² aggregation levels (full detail, each
    single-dimension margin, grand total) in ONE Expand + hash-agg pass,
    disambiguated by grouping_id (ROLLUP's 3-level sibling is
    rollup_order_totals). The Expand multiplies rows 4× BEFORE the agg,
    but partial aggregation still combines map-side, so the shuffle
    carries ≈4×|groups|, not 4×|rows| — the reason CUBE beats four
    separate scans at 100 TB."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).cast("bigint").alias("price_cents"),
        )
        .select("o_orderpriority", "o_orderstatus", "gid", "n_orders", "price_cents")
    )


@register(
    "q6_forecast_revenue",
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND round(l_discount * 100) BETWEEN 5 AND 7
  AND l_quantity < 24""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + scalar aggregate — the canonical predicate
    -pushdown benchmark. Every predicate (date range, discount band,
    quantity) reaches the parquet scan as a pushed filter; the product
    sums as exact integer (cents × basis points), divided once at the
    end. One map-side-combined scalar agg, no shuffle of data rows."""
    l = load(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_bp = F.round(F.col("l_discount") * 100).cast("bigint")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & disc_bp.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(price_c * disc_bp).cast("bigint") / F.lit(10000.0)).alias("revenue"))
    )


@register(
    "q12_late_shipment_class",
    """SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
GROUP BY l_returnflag""",
)
def q12_late_shipment_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode column, so the grouping is
    l_returnflag and "late" = shipped >45 days after ordering): per-group
    conditional two-way counts of urgent vs non-urgent orders among late
    shipments — the dual-CASE pivot counting pattern.

    Plan: one fact join on orderkey (orders projected to 3 columns) with
    the late predicate as a join filter, then a 3-row conditional agg —
    both CASE sums ride the same map-side partial pass."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    """WITH r AS (
  SELECT CASE WHEN p_type = 'PROMO'
              THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              ELSE 0 END AS promo_c,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS all_c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
)
SELECT 100.0 * CAST(sum(promo_c) AS BIGINT) / CAST(sum(all_c) AS BIGINT)
         AS promo_revenue_pct
FROM r""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotional revenue share for one month — conditional
    revenue ratio over a broadcast part join. Both numerator and
    denominator are exact integer cents summed in one agg; the single
    float division happens once, in the same written order as the
    oracle."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    promo_c = F.when(F.col("p_type") == "PROMO", rev_c).otherwise(F.lit(0))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo_c).cast("bigint")
                / F.sum(rev_c).cast("bigint")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q19_disjunctive_revenue",
    """SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) / 100.0 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs across both join sides — the disjunctive-
    predicate shape optimizers historically mishandled (it cannot be
    fully pushed to either scan alone). Catalyst extracts the common
    per-side conjuncts: the brand IN-list and max size range prune the
    part scan, the overall quantity envelope prunes lineitem, and the
    exact disjunction applies after the broadcast join — same rows, far
    smaller join input."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg((F.sum(rev_c).cast("bigint") / F.lit(100.0)).alias("revenue"))
    )


@register(
    "q10_returned_items",
    """WITH r AS (
  SELECT c_custkey, c_name, n_name,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS BIGINT) AS rev_c
  FROM customer JOIN orders ON c_custkey = o_custkey
                JOIN lineitem ON o_orderkey = l_orderkey
                JOIN nation ON n_nationkey = c_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  GROUP BY c_custkey, c_name, n_name
)
SELECT c_custkey, c_name, n_name, rev_c / 100.0 AS revenue
FROM r ORDER BY rev_c DESC, c_custkey LIMIT 20""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top customers by revenue lost to returned items in a
    half-year window — star join (customer and nation broadcast), one
    custkey agg, global top-20 with a deterministic c_custkey tie-break
    so LIMIT is well-defined on both engines. The global top-k is a
    TakeOrdered over per-partition heaps, not a full sort."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev_c).cast("bigint").alias("rev_c"))
        .orderBy(F.col("rev_c").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "n_name", (F.col("rev_c") / F.lit(100.0)).alias("revenue")
        )
    )


@register(
    "q15_top_supplier",
    """WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS BIGINT) AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_c / 100.0 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_c = (SELECT max(total_c) FROM rev)""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue — the
    scalar-MAX-subquery shape (the original uses a view; decorrelated
    identically): one suppkey agg, a 1-row max broadcast back as a
    filter, ties kept. Revenue compares as exact integer cents, so the
    max-equality join cannot float-miss."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    rev = l.groupBy("l_suppkey").agg(F.sum(rev_c).cast("bigint").alias("total_c"))
    mx = rev.agg(F.max("total_c").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_c") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", (F.col("total_c") / F.lit(100.0)).alias("total_revenue")
        )
    )


@register(
    "q17_small_quantity_avg",
    """WITH pa AS (
  SELECT l_partkey AS pk,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         / 100.0 / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
              JOIN pa ON pa.pk = l_partkey
WHERE p_brand = 'Brand#9'
  AND CAST(round(l_quantity * 100) AS BIGINT) * 2 * cnt < qty_c""",
)
def q17_small_quantity_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue impact of small-quantity orders — the
    correlated scalar-AVG subquery (qty < 0.5·avg(qty) per part),
    decorrelated into a per-part sufficient-statistics agg and an EXACT
    integer cross-multiplied comparison (2·qty·n < Σqty — no float
    average exists on either engine, so threshold ties are impossible to
    get wrong). The brand filter prunes the part broadcast; the stats agg
    is the only extra shuffle."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    qty_c = F.round(F.col("l_quantity") * 100).cast("bigint")
    pa = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(qty_c).cast("bigint").alias("qty_c"),
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#9").select(
        "p_partkey"
    )
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(pa, F.col("l_partkey") == F.col("pk"))
        .filter(qty_c * 2 * F.col("cnt") < F.col("qty_c"))
        .agg(
            (F.sum(price_c).cast("bigint") / F.lit(100.0) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q7_nation_volume",
    """SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev_c) AS BIGINT) / 100.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS rev_c
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON n1.n_nationkey = s_nationkey
                JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year —
    the two-sided symmetric-predicate star join. Both nation dims
    broadcast pre-filtered to the two names, which transitively prunes
    supplier and customer BEFORE the fact joins; the disjunctive
    cross-pair condition applies post-join on broadcast columns (the
    adapted names are this generator's NATION_k labels)."""
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("snk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .select("c_custkey", "cust_nation")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg((F.sum(rev_c).cast("bigint") / F.lit(100.0)).alias("revenue"))
    )


@register(
    "q9_product_profit",
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(10 * CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)
              - CAST(round(p_retailprice * 100) AS BIGINT)
                * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) / 1000.0
         AS profit
FROM lineitem JOIN part ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no ps_supplycost, so cost is modeled as
    10% of retail price per unit): profit by supplier nation and order
    year for parts matching a name pattern. All dims broadcast (part
    pre-filtered by the LIKE, which prunes the join input ~an order of
    magnitude); the only shuffles are the fact joins on their natural
    keys and the final small agg. The cost term uses integer cents with
    div-10 kept INSIDE the per-row expression, matching the oracle's
    operation order exactly (integer division truncation is
    per-row-identical on both engines)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount",
        "l_quantity",
    )
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    cost_dc = F.round(F.col("p_retailprice") * 100).cast("bigint") * F.round(
        F.col("l_quantity")
    ).cast("bigint")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (F.sum(F.lit(10) * rev_c - cost_dc).cast("bigint") / F.lit(1000.0)).alias(
                "profit"
            )
        )
    )


@register(
    "q8_market_share",
    """WITH all_lines AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS rev_c,
         n2.n_name AS supp_nation
  FROM lineitem JOIN part ON p_partkey = l_partkey
                JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON n1.n_nationkey = c_nationkey
                JOIN region ON r_regionkey = n1.n_regionkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_c ELSE 0 END)
            AS BIGINT) * 1.0
         / CAST(sum(rev_c) AS BIGINT) AS mkt_share
FROM all_lines GROUP BY o_year""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for one part
    type, by order year — the conditional-numerator/total-denominator
    ratio over a 7-table star. Every dim broadcasts (region→nation
    filters customers transitively BEFORE the fact joins; part
    pre-filtered by type); numerator and denominator accumulate in one
    agg as exact integer cents, divided once per year row in the same
    written order as the oracle."""
    n1 = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cnk"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cnk"), "left_semi")
        .select("c_custkey")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
                )
            ),
            F.col("s_nationkey") == F.col("snk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    num = F.when(F.col("supp_nation") == "NATION_3", rev_c).otherwise(F.lit(0))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(num).cast("bigint") * F.lit(1.0)
                / F.sum(rev_c).cast("bigint")
            ).alias("mkt_share")
        )
    )


@register(
    "q13_customer_distribution",
    """WITH per_cust AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (adapted: the comment-pattern exclusion becomes a
    priority exclusion — this schema has no o_comment): distribution of
    customers by order count, INCLUDING zero-order customers — the left
    outer join + stacked double aggregation whose first agg key is the
    join key (so the count agg reuses the join's partitioning; the
    second agg is a ~dozens-row map-side partial). count(o_orderkey)
    counts only matched rows, giving the correct 0 for order-less
    customers."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_orderkey", "o_custkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q20_supply_concentration",
    """WITH vol AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q_c
  FROM lineitem GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey AS pk, CAST(sum(q_c) AS BIGINT) AS tot_c,
         CAST(count(*) AS BIGINT) AS n_sup
  FROM vol GROUP BY l_partkey
)
SELECT s_suppkey, s_name, count(*) AS n_dominated_parts
FROM vol JOIN tot ON pk = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
WHERE n_sup >= 2 AND q_c * n_sup > 2 * tot_c
GROUP BY s_suppkey, s_name""",
)
def q20_supply_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp availqty, so "excess share"
    = supplier shipped more than TWICE the fair 1/n share of a
    multi-supplier part's volume): per supplier, how many parts they
    dominate — the nested
    per-(part,supplier) vs per-part aggregate comparison, decorrelated
    into two stacked aggs on the same key prefix (the re-agg reuses the
    first shuffle's partitioning) with an exact integer
    q·n > 2·total over-share test."""
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    qc = F.round(F.col("l_quantity") * 100).cast("bigint")
    vol = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qc).cast("bigint").alias("q_c")
    )
    tot = vol.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("q_c").cast("bigint").alias("tot_c"),
        F.count(F.lit(1)).alias("n_sup"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        vol.join(tot, F.col("pk") == F.col("l_partkey"))
        .filter(
            (F.col("n_sup") >= 2)
            & (F.col("q_c") * F.col("n_sup") > F.lit(2) * F.col("tot_c"))
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )
