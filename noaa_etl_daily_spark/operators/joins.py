"""Join operators (SURVEY.md §2.3).

Spark-first scale notes:

- Dimension joins (region/nation/customer/supplier/part) are explicitly
  ``broadcast()``-hinted: at 100 TB the fact table never shuffles for a
  dim join — each executor gets the dim hash table. (AQE would usually
  pick this anyway; the hint makes the plan deterministic.)
- Fact-fact joins (lineitem⋈orders, events⋈events) shuffle on the join
  key; AQE handles skew splitting at runtime.
- The theta/range self-join keeps an EQUI component (user_id) so Spark
  plans a hash join with the range condition as a post-join filter —
  never a broadcast-nested-loop over the full fact table.
- The as-of join is implemented with the union + window trick: O(n log n)
  per key with a single shuffle, instead of the O(n·m) join+filter+rank
  naive form. This is the scalable pattern for "latest reading at or
  before T" lookups (the NOAA station-observation alignment problem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "join_inner_equi",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
           l.l_extendedprice * (1 - l.l_discount) AS net_price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join (observation→batch-header analogue). Shuffle
    hash / sort-merge on the key; the status filter is pushed below the
    join on the orders side."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_custkey",
            "o_orderstatus",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


@register(
    "join_broadcast_chain",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (TPC-H Q5 shape): revenue per region/nation.
    nation/region are broadcast-hinted (fixed 25/5 rows at every scale);
    customer is left to AQE so the plan stays safe when customer is
    billions of rows — the only guaranteed shuffles are lineitem⋈orders
    (+ customer if AQE declines to broadcast) and the final agg exchange."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer SCALES with the data (billions of rows at 100 TB) — no
        # forced broadcast hint; AQE/autoBroadcastJoinThreshold picks the
        # strategy from actual size. Only the fixed-cardinality dims
        # (nation=25, region=5) are hinted.
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers with no matching (P-status)
    orders — null extension on the right side."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    ).select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(cu.nationkey, su.nationkey) AS nationkey,
           cu.n_customers, su.n_suppliers
    FROM (SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_customers
          FROM customer WHERE c_acctbal > 5000 GROUP BY c_nationkey) cu
    FULL JOIN (SELECT s_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_suppliers
               FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey) su
      ON cu.nationkey = su.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates: nations with high-balance
    customers vs suppliers — nulls appear on whichever side is absent."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    cu = (
        customer.filter(F.col("c_acctbal") > 5000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    su = (
        supplier.filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cu.join(su, "nationkey", "full").select(
        "nationkey", "n_customers", "n_suppliers"
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filter (left semi): customers with at least one finished
    order. Semi join never duplicates left rows — cheaper than join +
    distinct at scale."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence filter (left anti): customers with no pending orders."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(r.r_regionkey = n.n_regionkey AS BOOLEAN) AS same_region
    FROM region r
    CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (basis of brute-force similarity §2.10) — only
    ever sane when at least one side is tiny/broadcast, as here."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    return region.crossJoin(F.broadcast(nation)).select(
        "r_name",
        "n_name",
        (F.col("r_regionkey") == F.col("n_regionkey")).alias("same_region"),
    )


@register(
    "join_theta_range",
    oracle="""
    -- CAST(ts AS TIMESTAMP) floors ns → µs exactly like the Spark-side
    -- load_events conversion, so both engines join on identical µs values
    -- even if fixtures ever carry sub-µs precision.
    SELECT a.event_id AS first_id, b.event_id AS second_id, a.user_id,
           CAST(date_diff('microseconds', a.ts, b.ts) AS BIGINT) AS gap_us
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
          FROM events) a
    JOIN (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
          FROM events) b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join: view→purchase pairs by the same user within
    5 minutes. The equi component (user_id) keeps this a hash/sort-merge
    join with the range as a residual filter — NOT a nested-loop over the
    fact table, which is what a bare theta join would plan at 100 TB."""
    events = load(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "view").alias("a")
    b = events.filter(F.col("event_type") == "purchase").alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
    ).select(
        F.col("a.event_id").alias("first_id"),
        F.col("b.event_id").alias("second_id"),
        F.col("a.user_id").alias("user_id"),
        (
            # ntz→ltz cast is wall-clock-identity under the pinned UTC session
            F.unix_micros(F.col("b.ts").cast("timestamp"))
            - F.unix_micros(F.col("a.ts").cast("timestamp"))
        ).alias("gap_us"),
    )


@register(
    "join_asof",
    oracle="""
    SELECT purchase_id, purchase_ts, user_id, view_id, view_ts
    FROM (
        SELECT p.event_id AS purchase_id, p.ts AS purchase_ts, p.user_id,
               v.event_id AS view_id, v.ts AS view_ts,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY v.ts DESC, v.event_id DESC) AS rn
        FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
              FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
                   FROM events WHERE event_type = 'view') v
          ON v.user_id = p.user_id AND v.ts <= p.ts
    )
    WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest view by the same user at
    or before the purchase time (ties broken by highest event_id).

    Implemented with the scalable union+window pattern: tag both streams,
    union, and take last(view, ignorenulls) over (user, ts) ordering —
    one shuffle, O(n log n) per key, no join blow-up. DuckDB's native
    ASOF JOIN is the oracle's idiomatic form but leaves equal-ts ties
    engine-defined, so the oracle uses the explicit window form."""
    events = load(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_purchase"),
        F.col("event_id"),
        F.struct("ts", "event_id").alias("view_info"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
        F.col("event_id"),
        F.lit(None)
        .cast("struct<ts:timestamp_ntz,event_id:bigint>")
        .alias("view_info"),
    )
    # Views sort before purchases at equal ts (is_purchase asc) so an
    # equal-ts view is visible to the purchase; among equal-ts views the
    # highest event_id wins (matches the oracle's ORDER BY ... event_id DESC).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = views.unionByName(purchases).withColumn(
        "last_view", F.last("view_info", ignorenulls=True).over(w)
    )
    return tagged.filter(F.col("is_purchase") == 1).select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "user_id",
        F.col("last_view.event_id").alias("view_id"),
        F.col("last_view.ts").alias("view_ts"),
    )


@register(
    "join_range_interval_bucketed",
    oracle="""
    SELECT a.event_id AS first_id, b.event_id AS second_id,
           CAST(date_diff('microseconds', a.ts, b.ts) AS BIGINT) AS gap_us
    FROM events a JOIN events b
      ON a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    """,
)
def join_range_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval join with NO equi key (any view ↔ any purchase
    within 5 minutes) — the case where naive Spark plans a nested loop
    over the whole pair space. The scale rewrite: quantize time into
    window-width buckets, explode the LEFT side into its two candidate
    buckets (an interval of width W can only overlap buckets b and
    b+1), equi-join on the bucket id, and apply the exact range as a
    residual predicate. The nested loop becomes a hash join whose
    build/probe keys are time buckets — at 100 TB this shuffles each
    side once on a perfectly dense, naturally load-balanced key, which
    is how Flink/Databricks execute interval joins internally. Each
    (a, b) pair meets in exactly one bucket (b's own), so no dedup pass
    is needed. Oracle is the direct range predicate — a hash-match
    proves the rewrite is exactly the naive semantics."""
    w_us = 300 * 1_000_000  # bucket width == interval width (5 min)
    events = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    a = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("first_id"),
            us.alias("a_us"),
            F.explode(
                F.array(
                    F.floor(us / w_us), F.floor(us / w_us) + 1
                )
            ).alias("bucket"),
        )
    )
    b = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("second_id"),
        us.alias("b_us"),
        F.floor(us / w_us).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .where(
            (F.col("b_us") > F.col("a_us"))
            & (F.col("b_us") <= F.col("a_us") + w_us)
        )
        .select(
            "first_id",
            "second_id",
            (F.col("b_us") - F.col("a_us")).alias("gap_us"),
        )
    )


@register(
    "sql_scalar_subquery_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders o
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    """,
)
def sql_scalar_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders priced >1.5× their own
    customer's average. Catalyst DECORRELATES this into a per-customer
    aggregate joined back to orders (RewriteCorrelatedScalarSubquery):
    one extra aggregation + one equi-join, NOT a per-row subquery
    execution — the plan shape that keeps correlated SQL viable at
    100 TB. The oracle runs the identical SQL in DuckDB."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM _sq_orders o
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice)
                                    FROM _sq_orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "sql_exists_not_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def sql_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — customers with a finished order
    but no urgent one. Catalyst rewrites the pair into a LEFT SEMI join
    chained with a LEFT ANTI join on the same key (RewritePredicateSubquery)
    — both hash joins, no per-row re-execution. The
    DataFrame twins (join_left_semi / join_left_anti) are registered
    separately; this proves the SQL front door reaches the same plans."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_sq_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders2")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM _sq_customer c
        WHERE EXISTS (SELECT 1 FROM _sq_orders2 o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM _sq_orders2 o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        """
    )


@register(
    "sql_lateral_topk",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table with per-row ORDER BY/LIMIT —
    "top-2 orders per customer" phrased the way an analyst writes it.
    Catalyst DECORRELATES the lateral subquery (DecorrelateInnerQuery):
    the plan is one shuffle of orders on o_custkey with a ranked-window
    filter joined back to customer — NOT a per-customer re-execution of
    the subquery, so it scales like win_topk_per_group (its DataFrame
    twin) rather than like a nested loop. This op proves the SQL front
    door reaches that plan."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM _lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM _lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )


@register(
    "sql_not_in_null_aware",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 400000)
      AND c_acctbal > 0
    """,
)
def sql_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``NOT IN (subquery)`` — the null-aware anti join. Semantically
    distinct from NOT EXISTS / left-anti: one NULL in the subquery
    empties the whole result, so Spark plans single-column NOT IN as a
    null-aware anti join that must BROADCAST the subquery side.
    That is the 100 TB lesson this op encodes: NOT IN over a scaling
    subquery is a plan hazard (broadcast-only strategy) — rewrite to
    NOT EXISTS (join_left_anti, registered separately) when the inner
    side is known null-free. Kept here with a bounded subquery
    (high-value orders) so the broadcast is justified at any scale."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_ni_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_ni_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM _ni_customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM _ni_orders
                                WHERE o_totalprice > 400000)
          AND c_acctbal > 0
        """
    )


@register(
    "join_asof_tolerance",
    oracle="""
    SELECT purchase_id, purchase_ts, user_id, view_id,
           CAST(date_diff('microseconds', view_ts, purchase_ts) AS BIGINT)
             AS staleness_us
    FROM (
        SELECT p.event_id AS purchase_id, p.ts AS purchase_ts, p.user_id,
               v.event_id AS view_id, v.ts AS view_ts,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY v.ts DESC, v.event_id DESC) AS rn
        FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
              FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
                   FROM events WHERE event_type = 'view') v
          ON v.user_id = p.user_id AND v.ts <= p.ts
         AND v.ts >= p.ts - INTERVAL 30 MINUTE
    )
    WHERE rn = 1
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance — the feature-store rule
    "use the latest feature value, but only if it is fresher than 30
    minutes". Same single-shuffle union+window pattern as join_asof
    (no per-row subquery, no range blow-up); the tolerance is a
    post-window NULL-out, which is exact because the as-of match is
    the NEWEST candidate — if it is stale, every other candidate is
    staler. Staleness is reported in integer µs on both engines."""
    events = load(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_purchase"),
        F.col("event_id"),
        F.struct("ts", "event_id").alias("view_info"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
        F.col("event_id"),
        F.lit(None)
        .cast("struct<ts:timestamp_ntz,event_id:bigint>")
        .alias("view_info"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = views.unionByName(purchases).withColumn(
        "last_view", F.last("view_info", ignorenulls=True).over(w)
    )
    staleness = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("last_view.ts").cast("timestamp")
    )
    fresh = staleness <= F.lit(30 * 60 * 1000000)
    return tagged.filter(F.col("is_purchase") == 1).select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "user_id",
        F.when(fresh, F.col("last_view.event_id")).alias("view_id"),
        F.when(fresh, staleness).alias("staleness_us"),
    )


@register(
    "join_asof_forward",
    oracle="""
    SELECT view_id, view_ts, user_id, purchase_id, purchase_ts
    FROM (
        SELECT v.event_id AS view_id, v.ts AS view_ts, v.user_id,
               p.event_id AS purchase_id, p.ts AS purchase_ts,
               row_number() OVER (PARTITION BY v.event_id
                                  ORDER BY p.ts ASC, p.event_id ASC) AS rn
        FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
              FROM events WHERE event_type = 'view') v
        LEFT JOIN (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
                   FROM events WHERE event_type = 'purchase') p
          ON p.user_id = v.user_id AND p.ts >= v.ts
    )
    WHERE rn = 1
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each view, the EARLIEST purchase by the
    same user at or after the view time (ties broken by lowest
    event_id) — the 'time-to-conversion' direction, which DuckDB's
    native ASOF (backward-only) cannot express, hence the explicit
    window oracle.

    Same scalable union+window pattern as join_asof, traversed in
    REVERSE time order: one shuffle on user_id, O(n log n) per key, no
    join blow-up. Ordering encodes the tie rules: at equal ts the
    purchase sorts before the view (so an equal-ts purchase is
    visible), and equal-ts purchases traverse highest-id-first so
    ``last()`` retains the lowest id."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_view"),
        F.col("event_id"),
        F.struct("ts", "event_id").alias("purchase_info"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_view"),
        F.col("event_id"),
        F.lit(None)
        .cast("struct<ts:timestamp_ntz,event_id:bigint>")
        .alias("purchase_info"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), "is_view", F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = purchases.unionByName(views).withColumn(
        "next_purchase", F.last("purchase_info", ignorenulls=True).over(w)
    )
    return tagged.filter(F.col("is_view") == 1).select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        "user_id",
        F.col("next_purchase.event_id").alias("purchase_id"),
        F.col("next_purchase.ts").alias("purchase_ts"),
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH l AS (
      SELECT nullif(o_orderpriority, '1-URGENT') AS pr,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ), r AS (
      SELECT nullif(o_orderpriority, '1-URGENT') AS pr,
             round(sum(o_totalprice), 2) AS finished_rev
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    )
    SELECT l.pr, l.n_orders, r.finished_rev
    FROM l JOIN r ON l.pr IS NOT DISTINCT FROM r.pr
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` ↔ ``IS NOT DISTINCT FROM``):
    two priority-grain aggregates joined so the NULL bucket (minted
    deterministically via nullif on '1-URGENT') matches itself instead
    of silently dropping — the semantics regular equi-joins get wrong
    when a join key is nullable. Spark plans ``eqNullSafe`` as a HASH
    join (the key hashes NULL like any value), NOT a nested loop, so
    the shape scales exactly like join_inner_equi; both inputs are
    pre-aggregated to ≤5 rows before the join, so at 100 TB the only
    full-data work is the two partial-agg scans."""
    orders = load(spark, sf_dir, "orders")
    pr = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pr")
    left = orders.groupBy(pr).agg(F.count(F.lit(1)).alias("n_orders"))
    right = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(pr)
        .agg(F.round(F.sum("o_totalprice"), 2).alias("finished_rev"))
    )
    return left.join(right, left.pr.eqNullSafe(right.pr)).select(
        left.pr, "n_orders", "finished_rev"
    )


@register(
    "join_scd2_temporal",
    oracle="""
    WITH dim0 AS (
      SELECT user_id, ts, event_type, event_id FROM events
      WHERE event_type <> 'purchase'
    ), flagged AS (
      SELECT user_id, ts, event_type, event_id,
             CASE WHEN lag(event_type) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      FROM dim0
    ), dim AS (
      SELECT user_id, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to,
             event_type AS status
      FROM (SELECT * FROM flagged WHERE chg = 1)
    )
    SELECT f.event_id, f.user_id, f.ts, d.status
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') f
    LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND d.valid_from <= f.ts
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def join_scd2_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (SCD2) dimension lookup: each purchase joins the status
    row valid AT its timestamp — the fact-to-versioned-dimension join
    every warehouse runs. The textbook form is a RANGE predicate join
    (valid_from <= ts < valid_to — the oracle runs exactly that); at
    scale a range join degenerates to per-key nested loops, so the
    engine instead interleaves dimension change-points and facts in
    ONE per-user ordered window and carries the last status forward —
    the same union+window technique as join_asof, O(n log n) within
    one user_id shuffle and co-partitioned with the change-point
    derivation (no second exchange). Boundary semantics: a status
    change at exactly the purchase instant applies (dim rows sort
    before fact rows at equal ts); same-instant dim changes resolve by
    event_id, mirroring the oracle's empty-interval exclusion."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") != "purchase")
        .withColumn(
            "chg",
            (
                ~F.lag("event_type")
                .over(w)
                .eqNullSafe(F.col("event_type"))
            ).cast("int"),
        )
        .filter(F.col("chg") == 1)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.lit(0).alias("src"),
            F.col("event_type").alias("status"),
        )
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("src"),
        F.lit(None).cast("string").alias("status"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dim.unionByName(fact)
        .withColumn("carried", F.last("status", ignorenulls=True).over(ws))
        .filter(F.col("src") == 1)
        .select("event_id", "user_id", "ts", F.col("carried").alias("status"))
    )


@register(
    "join_asof_nearest",
    oracle="""
    SELECT purchase_id, purchase_ts, user_id, view_id, view_ts, delta_us
    FROM (
        SELECT p.event_id AS purchase_id, p.ts AS purchase_ts, p.user_id,
               v.event_id AS view_id, v.ts AS view_ts,
               CAST(date_diff('microseconds', p.ts, v.ts) AS BIGINT)
                 AS delta_us,
               row_number() OVER (
                 PARTITION BY p.event_id
                 ORDER BY abs(date_diff('microseconds', p.ts, v.ts)),
                          CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END,
                          CASE WHEN v.ts <= p.ts THEN -v.event_id
                               ELSE v.event_id END
               ) AS rn
        FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
              FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
                   FROM events WHERE event_type = 'view') v
          ON v.user_id = p.user_id
    )
    WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of join (either direction): each purchase pairs
    with the temporally CLOSEST view by the same user — the sensor-
    alignment flavor of as-of (pair each reading with the nearest
    calibration, before or after). Completes the as-of family:
    backward (join_asof), forward (join_asof_forward), bounded
    (join_asof_tolerance), nearest (this).

    Tie discipline (G3), mirrored exactly in the oracle: equal
    distance prefers the BACKWARD candidate; equal-ts backward views
    prefer the highest event_id, equal-ts forward views the lowest.

    Scale shape: TWO frame passes over ONE per-user ordered window
    (running last-non-null backward, first-non-null over the strictly-
    following frame forward) on the same union — still a single
    user_id shuffle and O(n log n) per key; the oracle's per-purchase
    ranked join over ALL same-user views is the O(n·m) form this
    pattern replaces."""
    events = load(spark, sf_dir, "events")
    view_info = F.struct("ts", "event_id").alias("view_info")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("is_purchase"), "event_id", view_info
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
        "event_id",
        F.lit(None)
        .cast("struct<ts:timestamp_ntz,event_id:bigint>")
        .alias("view_info"),
    )
    base = Window.partitionBy("user_id").orderBy("ts", "is_purchase", "event_id")
    back_w = base.rowsBetween(Window.unboundedPreceding, 0)
    fwd_w = base.rowsBetween(1, Window.unboundedFollowing)
    tagged = (
        views.unionByName(purchases)
        .withColumn("back", F.last("view_info", ignorenulls=True).over(back_w))
        .withColumn("fwd", F.first("view_info", ignorenulls=True).over(fwd_w))
    )
    p_us = F.unix_micros(F.col("ts").cast("timestamp"))
    back_d = p_us - F.unix_micros(F.col("back.ts").cast("timestamp"))
    fwd_d = F.unix_micros(F.col("fwd.ts").cast("timestamp")) - p_us
    pick_back = F.col("fwd").isNull() | (
        F.col("back").isNotNull() & (back_d <= fwd_d)
    )
    chosen = F.when(pick_back, F.col("back")).otherwise(F.col("fwd"))
    signed = F.when(pick_back, -back_d).otherwise(fwd_d)
    return tagged.filter(F.col("is_purchase") == 1).select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "user_id",
        chosen.getField("event_id").alias("view_id"),
        chosen.getField("ts").alias("view_ts"),
        F.when(chosen.isNull(), None).otherwise(signed).alias("delta_us"),
    )


@register(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy HINT surface: the same orders⋈customer join forced
    onto a SHUFFLED HASH join via ``hint('shuffle_hash')`` (plan-locked
    in tests/test_layout.py). Why a user reaches for it at 100 TB:
    when both sides are too big to broadcast, Spark's default is
    sort-merge — two full sorts; a shuffled hash join skips both sorts
    when the build side's PER-PARTITION slice fits memory, which the
    optimizer can't always prove but an operator often knows. The
    oracle certifies the hint changes the PLAN, never the result."""
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(
            cust.hint("shuffle_hash"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
