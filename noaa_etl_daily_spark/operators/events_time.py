"""Event-time operators over the ``events`` stream table (SURVEY.md §2.9).

Batch forms here (DuckDB-oracled, in the driver contract); the Structured
Streaming twins (``readStream`` + ``availableNow`` with watermarks /
``session_window`` / ``dropDuplicatesWithinWatermark``) live in
tests/test_streaming.py and are asserted equivalent to these batch plans.

Scale notes:

- Tumbling/sliding windows are plain hash aggregations on
  (window_start, key) — partial aggregation combines map-side, and the
  slide factor (4 windows/event at 1h/15min) is a bounded row multiplier
  inside the scan stage, not a shuffle amplifier.
- ``session_window`` is Spark's native batch sessionization: one shuffle
  on user_id, then in-partition merge — the gaps-and-islands oracle
  proves its semantics.
- The watermark batch-analogue keys every window by user_id, so the
  running watermark never needs a global single-partition sort (the
  streaming form's global watermark is handled by the engine itself).
- Stream dedup keeps first-by-(event-time, id) per logical key — a
  keyed window, skew-free on (user, type, minute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load
from .materialize import input_size_bytes, pin


@register(
    "evt_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def evt_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour per-type counts and value sums — the daily-ETL essence.
    ``window()`` is just a computed grouping column: map-side partial
    aggs combine before one shuffle on (hour, type). Values are
    2-decimal by fixture contract, so the sum runs in EXACT integer
    cents (a raw double sum's partial-agg fold order diverged from the
    oracle in the last rounded digit once sf0.1 spanned partitions —
    caught by the round-5 sf0.1 differential)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "evt_sliding_window",
    oracle="""
    SELECT window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           -- integer half-up of (sum_cents*100/n): 4dp average without
           -- a float fold or a round-half-boundary divergence. The
           -- division FLOORS via the modular identity because DuckDB's
           -- integer // truncates toward zero (G15) and hostile credit
           -- rows make the numerator negative
           CAST(((200 * sum(CAST(round(value * 100) AS BIGINT)) + count(*))
                 - (((200 * sum(CAST(round(value * 100) AS BIGINT))
                      + count(*)) % (2 * count(*)) + 2 * count(*))
                    % (2 * count(*)))) // (2 * count(*))
                AS BIGINT) / 10000.0 AS avg_value
    FROM (
      SELECT unnest(list_transform(generate_series(0, 3),
                    i -> time_bucket(INTERVAL 15 MINUTE, ts)
                         - i * INTERVAL 15 MINUTE)) AS window_start,
             event_type, value, ts
      FROM events
    )
    WHERE ts >= window_start
      AND ts < window_start + INTERVAL 1 HOUR
    GROUP BY 1, 2
    """,
)
def evt_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes. Each event lands in
    exactly duration/slide = 4 windows — Spark expands that inside the
    scan stage (no join against a generated series needed), then one
    hash agg on (window_start, type). The 4-decimal average derives
    from the EXACT integer cents sum by integer half-up division —
    neither the float fold order nor the round-half boundary can
    diverge between engines (the sf0.1 differential caught both)."""
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.floor(
                    (200 * F.sum(cents) + F.count(F.lit(1)))
                    / (2 * F.count(F.lit(1)))
                ).cast("bigint")
                / 10000.0
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


@register(
    "evt_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def evt_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize per user with a 30-minute inactivity gap using Spark's
    native ``session_window`` (batch-capable). Session range is
    [first_ts, last_ts + gap): an event arriving EXACTLY at the previous
    end EXTENDS the session (verified empirically by the boundary fuzz in
    tests/test_fuzz_differential.py — native windows touching at a point
    merge), so the gaps-and-islands oracle encodes the matching strict
    ``>`` split. One shuffle on user_id; merge is in-partition. Value
    totals sum in exact integer cents (G2: float partial-agg fold
    order is partitioning-dependent — sf0.1 differential)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0
            ).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "evt_watermark_late",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(sum(CASE WHEN is_late THEN 0 ELSE 1 END) AS BIGINT)
               AS n_kept
    FROM (
      SELECT user_id,
             ts < max(ts) OVER (PARTITION BY user_id
                                ORDER BY md5(CAST(event_id AS VARCHAR))
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING)
                  - INTERVAL 10 MINUTE AS is_late
      FROM events
    )
    GROUP BY user_id
    """,
)
def evt_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analogue of a 10-minute watermark: replay each user's events
    in a deterministic pseudo-arrival order (md5 of event_id — the
    fixture's ids are ts-ordered, so hashing simulates out-of-order
    delivery identically in both engines), track the running
    max-event-time watermark, and count events arriving more than 10
    minutes behind it. Keyed by user_id so the running window never
    needs a global single-partition sort; the true global-watermark form
    is the streaming twin (withWatermark) in tests/test_streaming.py."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.md5(F.col("event_id").cast("string")))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_late = F.col("ts") < F.max("ts").over(w) - F.expr("INTERVAL 10 MINUTES")
    return (
        ev.select("user_id", is_late.alias("is_late"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("n_late"),
            F.sum(F.when(F.col("is_late"), 0).otherwise(1)).alias("n_kept"),
        )
    )


@register(
    "evt_dedup_stream",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type, date_trunc('minute', ts)
        ORDER BY ts, event_id) = 1
    """,
)
def evt_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-shaped dedup: collapse repeated logical events (same user,
    same type, same minute) to the earliest occurrence — deterministic
    keep-first by (ts, event_id), unlike bare ``dropDuplicates`` whose
    survivor is partition-order-dependent. The streaming twin is
    ``dropDuplicatesWithinWatermark`` (tests/test_streaming.py). One
    keyed window shuffle; the key includes the minute bucket so state is
    naturally bounded — exactly why the streaming form can expire it."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("minute", "ts")
    ).orderBy("ts", "event_id")
    return (
        ev.select("event_id", "user_id", "event_type", "ts")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "evt_stateful_custom",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS first_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      GROUP BY e.user_id
    )
    SELECT u.user_id, v.first_view, c.first_click, p.first_purchase,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     WHEN v.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS INTEGER) AS funnel_stage
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN v ON v.user_id = u.user_id
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
    """,
)
def evt_stateful_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel state machine (view → click → purchase), batch
    form: three staged conditional-min aggregations joined on user_id.
    Each stage is a map-side-combinable agg + an equi-join on the same
    key, so at scale all three shuffles hash on user_id and AQE can
    coalesce them. The arbitrary-stateful streaming twin
    (transformWithStateInPandas / applyInPandasWithState) is exercised
    in tests/test_streaming.py."""
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    # r12 (census + plan audit): v and c are each read by the next
    # stage AND the final wide join; re-planning per reference cost 7
    # events scans + duplicated user-grain shuffles. r13: |users| grows
    # with the corpus, so each pin is size-gated (pinned while events
    # is small, recompute at scale).
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
        .transform(pin, approx_input_bytes=input_size_bytes(sf_dir, "events"))
    )
    c = (
        ev.join(v, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
        .transform(pin, approx_input_bytes=input_size_bytes(sf_dir, "events"))
    )
    p = (
        ev.join(c, "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("first_click"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            F.when(F.col("first_purchase").isNotNull(), 3)
            .when(F.col("first_click").isNotNull(), 2)
            .when(F.col("first_view").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("funnel_stage"),
        )
    )


@register(
    "evt_gap_filled_series",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM events WHERE event_type = 'purchase'
    ), calendar AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    ), actual AS (
      SELECT date_trunc('hour', ts) AS bucket,
             count(*) AS n, sum(value) AS sv
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    )
    SELECT c.bucket,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
           round(COALESCE(a.sv, 0.0), 4) AS total_value
    FROM calendar c LEFT JOIN actual a ON a.bucket = c.bucket
    """,
)
def evt_gap_filled_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series: hours with no purchases appear as
    explicit zero rows — the dense calendar every downstream
    forecasting/alerting consumer assumes (a missing bucket and a zero
    bucket mean different things).

    Plan shape: the calendar is ``sequence(min, max, interval)`` exploded
    from a 1-row aggregate — thousands of rows at any data scale, so
    Spark broadcasts it; the left join back to the (already aggregated,
    small) actuals never touches raw events a second time. The expensive
    side is one map-combined aggregation of the raw stream."""
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    actual = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    calendar = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    return calendar.join(actual, "bucket", "left").select(
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.round(F.coalesce("sv", F.lit(0.0)), 4).alias("total_value"),
    )


@register(
    "evt_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    )
    SELECT f.cohort,
           CAST(floor(date_diff('day', f.cohort, CAST(e.ts AS DATE)) / 7)
                AS INTEGER) AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN firsts f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
)
def evt_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted as active per week offset — the standard product-analytics
    triangle. Offsets are day-difference // 7 from the cohort start (not
    calendar week numbers), so both engines bucket identically across
    year boundaries. Two shuffles: the per-user min, and the
    (cohort, offset) count-distinct; the firsts table re-joins on
    user_id, which AQE broadcasts when small."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    return (
        ev.join(firsts, "user_id")
        .select(
            "cohort",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort")) / 7
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "evt_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 2) AS value,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s ON s.event_type = e.event_type
    WHERE abs((e.value - s.mu) / s.sigma) > 3.0
    """,
)
def evt_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flagging per event type — the quality-control
    pass of a NOAA-style ETL (flag observations >3σ from their group
    mean before they poison the rollups). Two passes over the data:
    one mergeable moment aggregation for (μ, σ) per type, then the tiny
    stats table broadcast back onto the stream for the filter — no
    window over the full data, no sort. The z-expression is identical
    on both sides and rounded at 4dp after the σ division."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


@register(
    "evt_scd2_history",
    oracle="""
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS BOOLEAN) AS is_current
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, ts, event_id
                               ORDER BY event_id) = 1
    """,
)
def evt_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history: each user's event
    stream becomes validity intervals — state valid from its own ts
    until the next change (NULL = current) — the standard warehouse
    history-table build, done with one partitioned window (lead) instead
    of a self-join. One shuffle on user_id; interval construction is
    in-partition. The trivial QUALIFY in the oracle mirrors Spark's
    deterministic (ts, event_id) ordering."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "evt_daily_rollup_reaggregate",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0, 4)
               AS total_value,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value,
           -- avg by exact integer FLOOR division: round(double, 4)
           -- here can land exactly on a representational midpoint
           -- (38.37875) where the engines tie-break differently
           -- (G14a). Floor via the modular identity because DuckDB's
           -- integer // truncates toward zero (G15), diverging from
           -- Spark's r - pmod floor on negative sums
           CAST(((sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * 100)
                 - (((sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * 100)
                     % count(*) + count(*)) % count(*))) // count(*)
                AS DOUBLE) / 10000 AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def evt_daily_rollup_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (the hypertable / continuous-aggregate
    pattern): daily stats are REAGGREGATED from hourly partials, never
    from raw rows — count/sum/min/max compose exactly, and avg is
    derived as sum/count at the last level. The oracle aggregates the
    raw table directly, so a hash-match PROVES the two-level rollup is
    lossless.

    The summed measure is quantized to integer cents at the leaf
    (floor(x*100+0.5) per raw row) BEFORE any aggregation: integer
    partials merge bit-identically in every order and across levels,
    so the hourly→daily cascade cannot drift from the raw-scan oracle
    by a float-summation-order ulp (the same pattern a production
    money/metric rollup uses for exactly-mergeable partials). At
    100 TB this is the materialized-view cascade: the hourly layer is
    ~10^4× smaller than raw, so dashboards re-rollup in milliseconds
    and the raw scan happens exactly once per hour of arrivals, not
    once per query."""
    ev = load(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    )
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sc"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return (
        hourly.groupBy(
            F.to_date(F.date_trunc("day", "hour")).alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("sc") / F.lit(100.0), 4).alias("total_value"),
            F.round(F.min("mn"), 4).alias("min_value"),
            F.round(F.max("mx"), 4).alias("max_value"),
            # exact integer floor division (r - pmod ≡ DuckDB //, for
            # negative sums too): round(double, 4) can land exactly on
            # a representational midpoint where engines tie-break
            # differently (G14a)
            (
                (
                    F.sum("sc") * 100
                    - F.pmod(F.sum("sc") * 100, F.sum("n"))
                )
                / F.sum("n")
                / F.lit(10000.0)
            ).alias("avg_value"),
        )
    )


@register(
    "evt_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked_after,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased_after
    """,
)
def evt_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → later click → later purchase):
    each stage is min-event-time per user CONSTRAINED to follow the
    previous stage — the product-analytics query sessionization alone
    can't answer.

    Scale shape: three per-user aggregates chained by two equi-joins on
    user_id — every shuffle is on the same key, so AQE/exchange reuse
    co-locates the chain; no window over a global ordering, no
    cross-user state. 100 TB of events reduce to |users| rows after the
    first aggregate."""
    ev = load(spark, sf_dir, "events")
    # r12 (census + plan audit): each stage frame is read by BOTH the
    # next stage and its own census count, and Catalyst re-planned the
    # chain per reference — 6 events scans and re-paid user-grain
    # shuffles in the physical plan, against the docstring's reuse
    # claim. r13: |users| grows with the corpus, so each frame's pin is
    # size-gated (pinned while events is small, recompute at scale).
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .transform(pin, approx_input_bytes=input_size_bytes(sf_dir, "events"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .transform(pin, approx_input_bytes=input_size_bytes(sf_dir, "events"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )


@register(
    "evt_interval_merge",
    oracle="""
    WITH iv AS (
      -- duration clamped to [0, 7d]: a corrupt value (negative, or
      -- 1e9 "minutes" = 19 centuries) must not produce an implausible
      -- interval that swallows every later island (G12 discipline)
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             epoch_us(CAST(ts AS TIMESTAMP))
               + least(greatest(CAST(floor(value * 60) AS BIGINT), 0),
                       604800) * 1000000 AS e
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY user_id
                  ORDER BY s, e, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             CAST(sum(new_island) OVER (PARTITION BY user_id
                  ORDER BY s, e, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS island_id
      FROM flagged
    )
    SELECT user_id, island_id,
           make_timestamp(min(s)) AS span_start,
           make_timestamp(max(e)) AS span_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, island_id
    """,
)
def evt_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user activity intervals (interval union /
    gaps-and-islands): each event spans [ts, ts + floor(value*60) s);
    touching or overlapping spans coalesce into one row with the merged
    extent and the event count.

    Scale shape: ONE shuffle on user_id serves both analytic windows
    (the running max(end) island detector and the island-id running
    sum share the same partitioning+ordering, so they evaluate in a
    single Window stage) and the final (user, island) groupBy arrives
    pre-partitioned on its prefix key. Everything is integer epoch-µs
    arithmetic — floor (not round) on the duration because floor of
    the same IEEE double is bit-identical across engines, while
    round's half-boundary mode is not. Ties broken by event_id so the
    island numbering is deterministic in both engines."""
    ev = load(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts").cast("timestamp"))
    # duration clamped to [0, 7d]: a corrupt value (negative, or 1e9
    # "minutes" = 19 centuries) must not produce an implausible
    # interval that swallows every later island (G12 discipline)
    dur = F.least(
        F.greatest(F.floor(F.col("value") * 60).cast("long"), F.lit(0)),
        F.lit(604800),
    )
    iv = ev.select(
        "user_id",
        "event_id",
        s.alias("s"),
        (s + dur * 1000000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(F.col("s") > F.max("e").over(w_prev), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island").over(w_run).cast("long").alias("island_id"),
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.timestamp_micros(F.min("s")).cast("timestamp_ntz").alias("span_start"),
        F.timestamp_micros(F.max("e")).cast("timestamp_ntz").alias("span_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("evt_hll_sliding_uniques", tags=("rows-only", "approx"))
def evt_hll_sliding_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day unique users per day, by HLL sketch
    REAGGREGATION: one pass builds a fixed-size sketch per day, then
    each day unions the seven daily sketches it covers — the raw event
    stream is scanned ONCE for all windows. This is the pattern that
    makes sliding distinct-counts feasible at 100 TB: exact sliding
    distinct must either rescan each window (7× read amplification) or
    shuffle every (day, user) pair into every window it touches; the
    sketch path shuffles ~1.5 KB per day per window. Approximate by
    nature → rows-only here; tests/test_properties.py holds the
    estimate within 5% of the exact count."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    # fan each daily sketch out to the 7 window-anchor days it serves
    fanned = daily.select(
        "sk",
        F.explode(
            F.array(*[F.date_add("day", i) for i in range(7)])
        ).alias("anchor_day"),
    )
    anchors = daily.select(F.col("day").alias("anchor_day")).distinct()
    return (
        fanned.join(anchors, "anchor_day")  # only emit days present in data
        .groupBy("anchor_day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_uniques_7d"
            )
        )
    )


@register(
    "evt_lateness_accounting",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             max(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                 PARTITION BY user_id % 16
                 ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS high_water
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN high_water - t > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_any,
           CAST(sum(CASE WHEN high_water - t > 3600000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_1h,
           CAST(sum(CASE WHEN high_water - t > 21600000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_6h,
           CAST(max(greatest(high_water - t, 0)) AS BIGINT) AS max_lateness_us
    FROM seq GROUP BY event_type
    """,
)
def evt_lateness_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay planning metric: per event type, how many events
    arrive (arrival order = event_id) BEHIND the high-water mark of
    event time seen so far on their INGEST SHARD, at delay budgets
    0 / 1 h / 6 h — exactly the numbers that justify a
    ``withWatermark`` setting before anyone deploys a stream.

    Scale shape: the high-water mark is tracked PER SHARD (here
    ``user_id % 16``, standing in for the Kafka/ingest partition a row
    arrived on), which is both the physically meaningful definition —
    arrival order only exists within an ingest partition, there is no
    global arrival sequence in a distributed source — and what makes
    the window partition-parallel: one shuffle on the shard key, no
    single-partition Window anywhere in the plan. Spark's streaming
    watermark itself advances per-partition the same way. The lateness
    comparisons are integer µs."""
    ev = load(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy(F.col("user_id") % 16)
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        t.alias("t"),
        F.max(t).over(w).alias("high_water"),
    )
    late = F.col("high_water") - F.col("t")
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(late > 0, 1).otherwise(0)).alias("late_any"),
        F.sum(F.when(late > 3600 * 1000000, 1).otherwise(0)).alias("late_1h"),
        F.sum(F.when(late > 21600 * 1000000, 1).otherwise(0)).alias("late_6h"),
        F.max(F.greatest(late, F.lit(0))).alias("max_lateness_us"),
    )


@register(
    "evt_session_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), paths AS (
      -- coalesce: a session whose only event types are NULL renders
      -- the EMPTY path on both engines (Spark's array_join skips NULL
      -- elements and returns ''; DuckDB's string_agg returns NULL)
      SELECT user_id, session_id,
             coalesce(string_agg(event_type, '>' ORDER BY ts, event_id),
                      '') AS path
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    """,
)
def evt_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics session paths: the ordered event-type sequence
    of every 30-minute session, aggregated into path frequencies
    ("view>click>purchase": 412). Sessionization reuses the
    gaps-and-islands windows of evt_session_window (one user_id
    shuffle); the path string is built by sorting each session's
    collected (ts, event_id, type) structs INSIDE the aggregate —
    collect_list carries no ordering guarantee, the array_sort is what
    makes the path deterministic (G3). The final path→count groupBy
    reduces to path-cardinality rows."""
    ev = load(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1000000
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_t = F.lag(t).over(w_lag)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            prev_t.isNull() | ((t - prev_t) >= gap_us), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = flagged.withColumn(
        "session_id", F.sum("new_session").over(w_run)
    )
    paths = numbered.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))


@register(
    "evt_dau_wau_stickiness",
    oracle="""
    WITH d AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day FROM d),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM d GROUP BY day
    ), wau AS (
      SELECT a.day, CAST(count(DISTINCT b.user_id) AS BIGINT) AS wau
      FROM days a JOIN d b ON b.day BETWEEN a.day - 6 AND a.day
      GROUP BY a.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           floor(dau.dau * 10000.0 / wau.wau) / 10000 AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def evt_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU / trailing-7-day WAU / stickiness ratio per day — the
    engagement dashboard primitives. One (day, user) dedup pass feeds
    both sides; WAU fans each day-user row into the ≤7 window anchors
    it serves (a join against the tiny distinct-days table), so raw
    events are scanned once. This is the EXACT path and its cost is
    the 7× row fan-out of the deduped day-user stream — at 100 TB the
    approximate sibling (evt_hll_sliding_uniques) fans out fixed-size
    sketches instead; keeping both documents the trade."""
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = d.select("day").distinct()
    dau = d.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fanned = d.select(
        "user_id",
        F.explode(
            F.array(*[F.date_add("day", i) for i in range(7)])
        ).alias("day"),
    )
    wau = (
        fanned.join(days, "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.floor(F.col("dau") * 10000.0 / F.col("wau")) / 10000).alias(
            "stickiness"
        ),
    )


@register(
    "evt_rate_limit_burst",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(count(*) OVER (
                 PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN 60000000 PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS burst
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           max(burst) AS max_burst_60s,
           max(burst) >= 3 AS over_limit
    FROM seq
    GROUP BY user_id
    """,
)
def evt_rate_limit_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit / burst accounting: for every user, the maximum
    number of events falling in any trailing 60-second window (the
    quota metric an API gateway or abuse detector keys on), via a
    RANGE frame over integer epoch-µs event time.

    Scale shape: one shuffle on user_id; the range-frame count and the
    per-user max share that partitioning (window then groupBy on the
    same key — no second exchange). A RANGE frame on the µs long is
    O(n) per partition with two moving pointers, not O(n²): Spark
    maintains the frame incrementally as rows advance. Counts are
    integers — no float hazard."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-60_000_000, 0)
    )
    seq = ev.select(
        "user_id", F.count(F.lit(1)).over(w).alias("burst")
    )
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("burst").alias("max_burst_60s"),
        (F.max("burst") >= 3).alias("over_limit"),
    )


#: memory-sink query names must be process-unique; a deterministic
#: counter (not a timestamp/uuid — builders must stay replay-safe)
_RLB_SEQ = [0]


@register(
    "evt_rate_limit_burst_stream",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(count(*) OVER (
                 PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN 60000000 PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS burst
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           max(burst) AS max_burst_60s,
           max(burst) >= 3 AS over_limit
    FROM seq
    GROUP BY user_id
    """,
    tags=("streaming",),
)
def evt_rate_limit_burst_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING form of evt_rate_limit_burst, registered as its own
    driver-oracled key (WAVE9 candidate 1): the events fixture is
    fanned into a time-ordered 3-file stream source, replayed with
    maxFilesPerTrigger=1 under Trigger.AvailableNow through the
    applyInPandasWithState token-bucket accounting in
    streaming.stream_rate_limit_stats, and the LAST emission per user
    (update mode emits a running answer per touched batch; n_events is
    strictly increasing, so max_by(n_events) is the final state) must
    BIT-EQUAL the batch window form — which is exactly what the shared
    DuckDB oracle asserts. This is the first registered key whose
    builder runs an actual streaming query, so the driver's hash gate
    certifies the stream path end-to-end, not just a local test.

    Scale shape: state is per-user and 60s-bounded (see the processor's
    docstring); the one shuffle is the same user_id layout as the batch
    window partition. Batch-cut independence (1 vs 3 vs all files per
    trigger) is asserted in tests/test_streaming_batchcut_invariance.py,
    retry-safety by the fault-injection suite."""
    from .. import streaming as st
    from .scans import _scratch, _sf_tag

    src = _scratch("stream_rlb", _sf_tag(sf_dir), "events")
    st.prepare_stream_source_timeordered(spark, sf_dir, src, n_files=3)
    _RLB_SEQ[0] += 1
    name = f"rlb_stream_{_RLB_SEQ[0]}"
    st.run_to_memory(
        st.stream_rate_limit_stats(
            # NoTimeout ON PURPOSE (WAVE12 c3 reverted on measurement,
            # seal r11 stage 4): the evict form's watermark makes the
            # stateful operator late-filter rows at-or-behind the
            # current watermark — which starts at epoch 0, so the
            # hostile corpus's epoch-zero default timestamp is late
            # from the FIRST batch and the batch oracle can never
            # hash-match (user 9003 reproduced; NULL-ts rows,
            # measured, are NOT filtered). The evicting production
            # variant exists behind evict=True for feeds with
            # upstream plausibility bounds (bound_event_time); its
            # answer identity on bounded feeds and the exact loss
            # mechanism are both pinned in test_streaming_eviction.
            st.read_events_stream(spark, src, max_files_per_trigger=1)
        ),
        name,
        "update",
    )
    emitted = spark.table(name)
    final = emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("max_burst_60s", "n_events").alias("max_burst_60s"),
        F.max_by("over_limit", "n_events").alias("over_limit"),
    )
    # materialize the per-user FINAL aggregate, then drop the memory
    # sink (ADVICE r10): the sink holds the whole update-mode emission
    # history in driver memory, and a lazy return would pin it for the
    # DataFrame's lifetime — repeated builder calls in one session
    # (strategy audits, batch-cut sweeps) would accumulate it per run
    out = final.localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


@register(
    "evt_session_attribution",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                 AS session_id
      FROM flagged
    ), attributed AS (
      SELECT *, first_value(event_type) OVER (
                 PARTITION BY user_id, session_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS first_touch
      FROM numbered
    )
    SELECT first_touch,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers,
           round(sum(value), 2) AS attributed_value
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY first_touch
    """,
)
def evt_session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every purchase is credited to the event
    type that OPENED its session (30-min inactivity gap, the
    evt_session_window semantics) — the marketing-analytics join of
    sessionization + conversion accounting.

    Scale shape: sessionize (lag flag → running sum), tag each row with
    its session's first event, filter to purchases, aggregate — and all
    three windows share one user_id shuffle because they agree on
    partitioning prefix and (ts, event_id) ordering; Spark plans a
    single Exchange with stacked Window operators. The final per-type
    aggregate touches only purchase rows. No collect, no self-join of
    events to sessions."""
    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    new_session = F.when(
        F.lag("ts").over(wo).isNull()
        | (
            t_us - F.unix_micros(F.lag("ts").over(wo).cast("timestamp"))
            >= 1800 * 1_000_000
        ),
        1,
    ).otherwise(0)
    # The session opener's type is carried FORWARD inside the same
    # user_id window (last non-null session-start marker up to the
    # current row) instead of a first_value over (user_id, session_id)
    # — that variant re-partitions on the finer key and costs a second
    # exchange; this one keeps the whole operator on ONE shuffle.
    run = wo.rowsBetween(Window.unboundedPreceding, 0)
    attributed = ev.withColumn("new_session", new_session).withColumn(
        "first_touch",
        F.last(
            F.when(F.col("new_session") == 1, F.col("event_type")),
            ignorenulls=True,
        ).over(run),
    )
    return (
        attributed.where(F.col("event_type") == "purchase")
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_buyers"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@register(
    "evt_experiment_ab_analysis",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 1 THEN 'treatment'
                  ELSE 'control' END AS arm,
             max(CASE WHEN event_type = 'purchase' AND value >= 75
                      THEN 1 ELSE 0 END) AS converted,
             sum(CASE WHEN event_type = 'purchase' AND value >= 75
                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS cents
      FROM events
      GROUP BY 1, 2
    ), arms AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_converted,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM per_user GROUP BY arm
    ), wide AS (
      SELECT
        sum(CASE WHEN arm = 'treatment' THEN n_users END) AS n_t,
        sum(CASE WHEN arm = 'treatment' THEN n_converted END) AS c_t,
        sum(CASE WHEN arm = 'treatment' THEN total_cents END) AS v_t,
        sum(CASE WHEN arm = 'control' THEN n_users END) AS n_c,
        sum(CASE WHEN arm = 'control' THEN n_converted END) AS c_c,
        sum(CASE WHEN arm = 'control' THEN total_cents END) AS v_c
      FROM arms
    )
    SELECT CAST(n_t AS BIGINT) AS n_treatment,
           CAST(n_c AS BIGINT) AS n_control,
           floor(c_t * 10000.0 / n_t) / 10000 AS conv_rate_treatment,
           floor(c_c * 10000.0 / n_c) / 10000 AS conv_rate_control,
           floor((c_t * 1.0 / n_t - c_c * 1.0 / n_c) * 10000) / 10000
               AS conv_lift,
           floor((c_t * 1.0 / n_t - c_c * 1.0 / n_c)
                 / sqrt((c_t + c_c) * 1.0 / (n_t + n_c)
                        * (1 - (c_t + c_c) * 1.0 / (n_t + n_c))
                        * (1.0 / n_t + 1.0 / n_c)) * 100) / 100 AS z_score,
           floor(v_t / 100.0 / n_t * 100) / 100 AS arpu_treatment,
           floor(v_c / 100.0 / n_c * 100) / 100 AS arpu_control
    FROM wide
    """,
)
def evt_experiment_ab_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment read-out: deterministic hash-bucket assignment
    (odd user_id → treatment), per-arm conversion rate (conversion = a high-value purchase, so the
    fixture's rate is non-degenerate), lift, the
    two-proportion z statistic, and ARPU — the product-analytics query
    every experimentation platform materializes.

    Scale shape: ONE per-user aggregate (conversion flag + value in
    integer cents) → one tiny per-arm aggregate → a 1-row wide pivot;
    nothing after the first groupBy touches more than |users| rows.
    All statistics are derived from integer counts/cents with
    IEEE-exact division/sqrt and floor-truncated display, so both
    engines produce bit-identical read-outs — determinism a real
    experiment pipeline also wants (a report that flickers in the last
    decimal across reruns erodes trust)."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy(
        "user_id",
        F.when(F.col("user_id") % 2 == 1, "treatment")
        .otherwise("control")
        .alias("arm"),
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 75),
                1,
            ).otherwise(0)
        ).alias("converted"),
        F.sum(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 75),
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("cents"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
        F.sum("cents").alias("total_cents"),
    )
    wide = arms.agg(
        F.sum(F.when(F.col("arm") == "treatment", F.col("n_users"))).alias("n_t"),
        F.sum(F.when(F.col("arm") == "treatment", F.col("n_converted"))).alias("c_t"),
        F.sum(F.when(F.col("arm") == "treatment", F.col("total_cents"))).alias("v_t"),
        F.sum(F.when(F.col("arm") == "control", F.col("n_users"))).alias("n_c"),
        F.sum(F.when(F.col("arm") == "control", F.col("n_converted"))).alias("c_c"),
        F.sum(F.when(F.col("arm") == "control", F.col("total_cents"))).alias("v_c"),
    )
    p_t = F.col("c_t") * 1.0 / F.col("n_t")
    p_c = F.col("c_c") * 1.0 / F.col("n_c")
    p_pool = (F.col("c_t") + F.col("c_c")) * 1.0 / (F.col("n_t") + F.col("n_c"))
    se = F.sqrt(
        p_pool * (1 - p_pool) * (1.0 / F.col("n_t") + 1.0 / F.col("n_c"))
    )
    return wide.select(
        F.col("n_t").alias("n_treatment"),
        F.col("n_c").alias("n_control"),
        (F.floor(F.col("c_t") * 10000.0 / F.col("n_t")) / 10000).alias(
            "conv_rate_treatment"
        ),
        (F.floor(F.col("c_c") * 10000.0 / F.col("n_c")) / 10000).alias(
            "conv_rate_control"
        ),
        (F.floor((p_t - p_c) * 10000) / 10000).alias("conv_lift"),
        (F.floor((p_t - p_c) / se * 100) / 100).alias("z_score"),
        (F.floor(F.col("v_t") / 100.0 / F.col("n_t") * 100) / 100).alias(
            "arpu_treatment"
        ),
        (F.floor(F.col("v_c") / 100.0 / F.col("n_c") * 100) / 100).alias(
            "arpu_control"
        ),
    )


@register(
    "evt_cumulative_new_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS first_day
      FROM events GROUP BY user_id
    ), per_day AS (
      SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY first_day
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM per_day
    """,
)
def evt_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-accretion curve: first-seen day per user → daily new-user
    counts → running total (the growth chart every product dashboard
    leads with).

    Scale shape: the per-user min is a map-combinable aggregate (100 TB
    of events reduce to |users| rows in one shuffle); the daily rollup
    is |users| → |days|; ONLY the final running sum is a global window,
    and it runs over day-cardinality rows (thousands, not billions) —
    the one place a single-partition window is legitimately fine, and
    the reason the heavy aggregation happens first."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date(F.date_trunc("day", "ts"))).alias("first_day")
    )
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


@register(
    "evt_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ), counted AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           floor(n * 1000000.0 / sum(n) OVER (PARTITION BY from_type))
               / 1000000 AS p
    FROM counted
    """,
)
def evt_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: counts and conditional probabilities P(next type |
    current type) — the behavioral model behind next-action prediction
    and anomaly scoring on event streams.

    Scale shape: the successor pairing is one lead() over the user_id
    shuffle; pair counting is map-combinable; the row-normalization
    window runs over the |types|² count matrix (25 rows here), not the
    data. Probabilities divide exact integers and are floor-truncated,
    so both engines render identical matrices."""
    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(wo).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counted = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wn = Window.partitionBy("from_type")
    return counted.select(
        "from_type",
        "to_type",
        "n",
        (F.floor(F.col("n") * 1000000.0 / F.sum("n").over(wn)) / 1000000).alias(
            "p"
        ),
    )


@register(
    "evt_seasonal_profile",
    oracle="""
    SELECT event_type,
           CAST(extract(hour FROM ts) AS INT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_events,
           floor(count(*) * 1000000.0
                 / sum(count(*)) OVER (PARTITION BY event_type)) / 1000000
               AS hour_share
    FROM events
    GROUP BY 1, 2
    """,
)
def evt_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: each event type's hour-of-day activity
    distribution (the diurnal curve an anomaly detector normalizes
    against, and the load model a capacity planner reads).

    Scale shape: one map-combinable aggregate to (type × 24) cells;
    the share normalization window runs over that tiny matrix, never
    the raw data. Integer counts with floor-truncated exact-integer
    division — engine-identical."""
    ev = load(spark, sf_dir, "events")
    counted = ev.groupBy(
        "event_type", F.hour("ts").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    wn = Window.partitionBy("event_type")
    return counted.select(
        "event_type",
        "hour_of_day",
        "n_events",
        (
            F.floor(
                F.col("n_events") * 1000000.0 / F.sum("n_events").over(wn)
            )
            / 1000000
        ).alias("hour_share"),
    )


@register(
    "evt_resurrection_analysis",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN prev_ts IS NOT NULL
                          AND ts - prev_ts > INTERVAL 2 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrections,
           CAST(max(CASE WHEN prev_ts IS NULL THEN 0
                         ELSE date_diff('second', prev_ts, ts) END)
                AS BIGINT) AS longest_gap_s
    FROM gaps
    GROUP BY user_id
    HAVING sum(CASE WHEN prev_ts IS NOT NULL
                     AND ts - prev_ts > INTERVAL 2 DAY
                    THEN 1 ELSE 0 END) > 0
    """,
)
def evt_resurrection_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-and-return ('resurrection') analysis: users who went
    silent for more than 2 days and came back, with their comeback
    count and longest absence — the retention team's win-back cohort.

    Scale shape: one lag() window and the per-user aggregate share the
    single user_id shuffle; the HAVING filter keeps only resurrected
    users (the interesting minority). Gap arithmetic is integer
    seconds."""
    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.unix_micros(F.lag("ts").over(wo).cast("timestamp"))
    gaps = ev.select(
        "user_id",
        ((t - prev) > 2 * 86400 * 1_000_000).alias("is_resurrection"),
        # DuckDB's date_diff('second') counts SECOND BOUNDARIES crossed
        # (truncate both ends, then subtract) — mirror that, not elapsed
        # microseconds
        F.when(prev.isNull(), F.lit(0))
        .otherwise(
            F.floor(t / 1_000_000).cast("long")
            - F.floor(prev / 1_000_000).cast("long")
        )
        .alias("gap_s"),
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("is_resurrection"), 1).otherwise(0)
            ).alias("n_resurrections"),
            F.max("gap_s").alias("longest_gap_s"),
        )
        .where(F.col("n_resurrections") > 0)
    )


@register(
    "evt_bounce_rate_daily",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), sessions AS (
      SELECT user_id, session_id,
             CAST(date_trunc('day', min(ts)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           floor(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 * 1000000.0 / count(*)) / 1000000 AS bounce_rate
    FROM sessions
    GROUP BY day
    """,
)
def evt_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: the share of sessions (30-min gap
    sessionization, keyed to the day they started) containing exactly
    one event — the engagement-quality headline metric.

    Scale shape: native session_window does the sessionization in one
    user_id shuffle; sessions then reduce to |days| rows. The oracle
    runs the gaps-and-islands desugaring, so the hash match re-proves
    session_window's boundary semantics through a second derived
    metric. Integer counts, floor-truncated exact division."""
    ev = load(spark, sf_dir, "events")
    sessions = (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("s")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.to_date(F.date_trunc("day", F.col("s.start"))).alias("day"),
            "n_events",
        )
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sessions.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounces.alias("n_bounces"),
        (F.floor(bounces * 1000000.0 / F.count(F.lit(1))) / 1000000).alias(
            "bounce_rate"
        ),
    )


@register(
    "evt_power_users",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             round(sum(value), 2) AS total_value
      FROM events GROUP BY user_id
    ), thresh AS (
      SELECT quantile_cont(CAST(n_events AS DOUBLE), 0.9) AS p90
      FROM per_user
    )
    SELECT u.user_id, u.n_events, u.total_value,
           round(t.p90, 4) AS p90_threshold
    FROM per_user u CROSS JOIN thresh t
    WHERE u.n_events > t.p90
    """,
)
def evt_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user segmentation: users whose event count exceeds the
    corpus's p90 — the self-calibrating top-decile cut (no hand-tuned
    threshold to drift as the product grows).

    Scale shape: one per-user aggregate; the p90 is an EXACT
    percentile over |users| integer counts reduced to a 1-row scalar
    and broadcast back (the evt_anomaly_zscore pattern); the filter
    evaluates in the joined scan of the per-user table. Exact
    percentile interpolation over integers is deterministic on both
    engines; at 100 TB you swap in the KLL sketch
    (agg_kll_quantile_sketch) for the threshold and keep the same
    plan."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    thresh = per_user.agg(
        F.expr("percentile(CAST(n_events AS DOUBLE), 0.9)").alias("p90")
    )
    return (
        per_user.crossJoin(F.broadcast(thresh))
        .where(F.col("n_events") > F.col("p90"))
        .select(
            "user_id",
            "n_events",
            "total_value",
            F.round("p90", 4).alias("p90_threshold"),
        )
    )


@register(
    "evt_decay_weighted_value",
    oracle="""
    -- integer half-up micro→4dp: round(x/1e6, 4) on a double hits
    -- half-boundaries where the engines' rounding bases differ
    -- (decimal string vs binary double). The ÷100 FLOORS via the
    -- modular identity because DuckDB's integer // truncates toward
    -- zero (G15) — on a negative sum (hostile credit rows) plain //
    -- would disagree with Spark's floor by one
    WITH s AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               sum(CAST(round(value / (1 + date_diff('day',
                                       CAST(ts AS DATE),
                                       DATE '2024-02-01'))
                              * 1000000) AS BIGINT)) + 50 AS shifted
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST((shifted - ((shifted % 100) + 100) % 100) // 100
                AS BIGINT) / 10000.0 AS decayed_value
    FROM s
    """,
)
def evt_decay_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay weighted engagement score: each event contributes
    value/(1+age_days) against a fixed anchor date — the recency
    weighting behind churn/LTV features. ONE hash aggregate with
    map-side partial combine; the decay weight is a scan-stage
    expression, so at 100 TB the only exchange is the user_id shuffle
    of partial sums. Determinism (G2): a float sum's order is
    engine-dependent, so each term is quantized to integer micro-units
    BEFORE the sum (1/(1+n) division is IEEE-exact-identical on both
    engines — no transcendental exp() whose last ulp could differ) and
    the integer sum is rescaled after; the final micro→4dp step is an
    integer half-up division, because round(double, 4) at an exact
    .00005 boundary differs between Spark (decimal-string HALF_UP) and
    DuckDB (binary-double rounding) — caught by the round-5 sf0.1
    differential."""
    ev = load(spark, sf_dir, "events")
    age_days = F.datediff(F.lit("2024-02-01").cast("date"), F.col("ts"))
    term = F.round(F.col("value") / (1 + age_days) * 1_000_000, 0).cast("long")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.floor((F.sum(term) + 50) / 100).cast("bigint") / 10000.0
        ).alias("decayed_value"),
    )


@register(
    "evt_funnel_time_to_convert",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.first_view
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.first_view, p.first_purchase,
           CAST(date_diff('microseconds', v.first_view, p.first_purchase)
                AS BIGINT) AS us_to_convert
    FROM v JOIN p ON v.user_id = p.user_id
    """,
)
def evt_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion latency: per user, the first 'view' and the
    first 'purchase' strictly after it — the time-to-convert metric
    behind activation dashboards (complements evt_funnel_steps, which
    counts stage reach). Shape: both aggregates and both joins key on
    user_id, so after the first shuffle everything is co-partitioned —
    AQE/EnsureRequirements reuses the partitioning instead of
    re-exchanging; at 100 TB this is 1 logical shuffle of events plus
    map-side pre-aggregated min()s. Latency is exact integer
    microseconds (unix_micros ↔ date_diff('microseconds')) — no
    boundary-crossing or float ambiguity (G2)."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.join(v, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("first_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return v.join(p, "user_id").select(
        "user_id",
        "first_view",
        "first_purchase",
        (
            F.unix_micros(F.col("first_purchase").cast("timestamp"))
            - F.unix_micros(F.col("first_view").cast("timestamp"))
        ).alias("us_to_convert"),
    )


@register(
    "evt_activity_autocorr",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT c,
             lead(c, 1) OVER (ORDER BY d) AS c1,
             lead(c, 7) OVER (ORDER BY d) AS c7
      FROM daily
    ),
    m1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(c) AS sx, sum(c1) AS sy,
             sum(c * c1) AS sxy, sum(c * c) AS sxx, sum(c1 * c1) AS syy
      FROM lagged WHERE c1 IS NOT NULL
    ),
    m7 AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(c) AS sx, sum(c7) AS sy,
             sum(c * c7) AS sxy, sum(c * c) AS sxx, sum(c7 * c7) AS syy
      FROM lagged WHERE c7 IS NOT NULL
    )
    SELECT m1.n AS n_pairs_lag1,
           round((m1.n * m1.sxy - m1.sx * m1.sy)
                 / sqrt((m1.n * m1.sxx - m1.sx * m1.sx)
                        * (m1.n * m1.syy - m1.sy * m1.sy)), 6) AS r_lag1,
           m7.n AS n_pairs_lag7,
           round((m7.n * m7.sxy - m7.sx * m7.sy)
                 / sqrt((m7.n * m7.sxx - m7.sx * m7.sx)
                        * (m7.n * m7.syy - m7.sy * m7.sy)), 6) AS r_lag7
    FROM m1, m7
    """,
)
def evt_activity_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity periodicity check: Pearson autocorrelation of the daily
    event-count series at lag 1 and lag 7 — the signal that tells an
    ops team whether traffic has a weekly rhythm (r_lag7 high) vs
    day-over-day momentum. Shape: the corpus reduces to ≤|days| rows
    in ONE hash aggregate; the lead() window and the moment fold then
    run over day-cardinality rows. Determinism (G2): every moment
    (Σx, Σy, Σxy, Σx², Σy²) is an INTEGER sum of integer counts —
    order-independent and engine-exact — so the final r is one float
    expression over exact integers; sqrt/divide are IEEE-identical.
    The m1×m7 join is a 1-row × 1-row cross of scalar aggregates."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "c",
        F.lead("c", 1).over(w).alias("c1"),
        F.lead("c", 7).over(w).alias("c7"),
    )

    def moments(col):
        src = lagged.filter(F.col(col).isNotNull())
        return src.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("sx"),
            F.sum(col).alias("sy"),
            F.sum(F.col("c") * F.col(col)).alias("sxy"),
            F.sum(F.col("c") * F.col("c")).alias("sxx"),
            F.sum(F.col(col) * F.col(col)).alias("syy"),
        )

    def pearson(p):
        n, sx, sy = F.col(f"{p}.n"), F.col(f"{p}.sx"), F.col(f"{p}.sy")
        sxy, sxx, syy = (
            F.col(f"{p}.sxy"),
            F.col(f"{p}.sxx"),
            F.col(f"{p}.syy"),
        )
        return F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        )

    m1 = moments("c1").alias("m1")
    m7 = moments("c7").alias("m7")
    # 1-row × 1-row: scalar-aggregate cross, bounded at any scale
    return m1.crossJoin(m7).select(
        F.col("m1.n").alias("n_pairs_lag1"),
        pearson("m1").alias("r_lag1"),
        F.col("m7.n").alias("n_pairs_lag7"),
        pearson("m7").alias("r_lag7"),
    )


@register(
    "evt_peak_concurrency",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), sessions AS (
      SELECT user_id, min(ts) AS s_start,
             max(ts) + INTERVAL 30 MINUTE AS s_end
      FROM numbered GROUP BY user_id, session_id
    ), bounds AS (
      SELECT CAST(s_start AS DATE) AS d, s_start AS t, 1 AS delta
      FROM sessions
      UNION ALL
      SELECT CAST(s_start AS DATE) AS d, s_end AS t, -1 AS delta
      FROM sessions
    ), running AS (
      SELECT d, delta,
             sum(delta) OVER (PARTITION BY d ORDER BY t, delta
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM bounds
    )
    SELECT d,
           CAST(max(conc) AS BIGINT) AS peak_concurrency,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions
    FROM running
    GROUP BY d
    """,
)
def evt_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning number
    (licenses, connection pools, autoscaling floors). Sessions come
    from the same native session_window as evt_session_window; each
    becomes a +1/-1 boundary pair and a running sum over the day's
    boundaries yields instantaneous concurrency, maxed per day.
    Sessions attribute to their START day (the stated metric
    definition, so midnight-crossers count once).

    Scale shape: the corpus reduces to SESSION boundaries (2 rows per
    session) before any ordering work; the sweep window partitions by
    DAY, so no global single-partition pass exists and each day's sort
    is over its own session count. Tie discipline (G3): boundaries
    order by (t, delta) with -1 < +1, so a session starting exactly at
    another's end never double-counts — deterministic in both engines.
    All arithmetic is integer."""
    ev = load(spark, sf_dir, "events")
    sessions = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("s.start").alias("s_start"), F.col("s.end").alias("s_end")
        )
    )
    starts = sessions.select(
        F.col("s_start").cast("date").alias("d"),
        F.col("s_start").alias("t"),
        F.lit(1).alias("delta"),
    )
    ends = sessions.select(
        F.col("s_start").cast("date").alias("d"),
        F.col("s_end").alias("t"),
        F.lit(-1).alias("delta"),
    )
    w = (
        Window.partitionBy("d")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = starts.unionAll(ends).select(
        "d", "delta", F.sum("delta").over(w).alias("conc")
    )
    return running.groupBy("d").agg(
        F.max("conc").alias("peak_concurrency"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_sessions"),
    )


@register(
    "evt_segment_transitions",
    oracle="""
    WITH weekly AS (
      SELECT user_id, date_trunc('week', ts) AS wk,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), tiered AS (
      SELECT user_id, wk,
             CASE WHEN n >= 25 THEN 'high'
                  WHEN n >= 10 THEN 'mid'
                  ELSE 'low' END AS tier,
             lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             lag(CASE WHEN n >= 25 THEN 'high'
                      WHEN n >= 10 THEN 'mid'
                      ELSE 'low' END)
               OVER (PARTITION BY user_id ORDER BY wk) AS prev_tier
      FROM weekly
    )
    SELECT prev_tier, tier, CAST(count(*) AS BIGINT) AS n_users
    FROM tiered
    WHERE prev_wk = wk - INTERVAL 7 DAY
    GROUP BY prev_tier, tier
    """,
)
def evt_segment_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-tier migration matrix: users bucketed into weekly
    activity tiers, counting tier→tier transitions between CONSECUTIVE
    weeks (the retention team's upgrade/downgrade flow; complements
    evt_transition_matrix, which is event-type Markov). The adjacency
    filter (prev week exactly 7 days back) keeps gap weeks from
    minting false transitions. Shape: the corpus reduces to (user,
    week) rows in ONE hash aggregate; the lag window and the final
    census run over that reduced grain, all integer arithmetic."""
    ev = load(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).agg(F.count(F.lit(1)).alias("n"))
    tier = (
        F.when(F.col("n") >= 25, "high")
        .when(F.col("n") >= 10, "mid")
        .otherwise("low")
    )
    w = Window.partitionBy("user_id").orderBy("wk")
    tiered = weekly.select(
        "user_id",
        "wk",
        tier.alias("tier"),
        F.lag("wk").over(w).alias("prev_wk"),
        F.lag(tier).over(w).alias("prev_tier"),
    )
    return (
        tiered.filter(
            F.col("prev_wk") == F.col("wk") - F.expr("INTERVAL 7 DAYS")
        )
        .groupBy("prev_tier", "tier")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "evt_slo_burn_rate",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS total,
             CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
               AS errors
      FROM events GROUP BY 1
    ), windows AS (
      SELECT h, total, errors,
             sum(errors) OVER w6 AS err_6h,
             sum(total)  OVER w6 AS tot_6h
      FROM hourly
      WINDOW w6 AS (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    )
    SELECT h,
           round(errors / total, 6)           AS fast_rate,
           round(err_6h / tot_6h, 6)          AS slow_rate,
           round(errors / total / 0.25, 6)    AS fast_burn,
           round(err_6h / tot_6h / 0.25, 6)   AS slow_burn,
           (errors / total / 0.25 >= 1.2)
             AND (err_6h / tot_6h / 0.25 >= 1.1) AS page_alert
    FROM windows
    """,
)
def evt_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the SRE-workbook pattern):
    a 25% error budget consumed at ≥1.2× over the last hour AND ≥1.1×
    over the trailing 6 hours pages — the two windows together
    suppress both blips (fast-only) and slow leaks already visible in
    the long window alone. ONE hourly pre-aggregate feeds both
    windows (the reaggregation-from-partials trick of
    evt_daily_rollup_reaggregate applied to alerting); the sliding
    window runs over HOUR-cardinality rows — bounded by the time
    range, never by event volume, which is why the global ordering is
    affordable (same justification as evt_cumulative_new_users).
    Integer counts divide exactly; both engines produce identical
    doubles (G2)."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("errors"),
    )
    w6 = Window.orderBy("h").rowsBetween(-5, Window.currentRow)
    windows = hourly.select(
        "h",
        "total",
        "errors",
        F.sum("errors").over(w6).alias("err_6h"),
        F.sum("total").over(w6).alias("tot_6h"),
    )
    fast = F.col("errors") / F.col("total")
    slow = F.col("err_6h") / F.col("tot_6h")
    return windows.select(
        "h",
        F.round(fast, 6).alias("fast_rate"),
        F.round(slow, 6).alias("slow_rate"),
        F.round(fast / 0.25, 6).alias("fast_burn"),
        F.round(slow / 0.25, 6).alias("slow_burn"),
        ((fast / 0.25 >= 1.2) & (slow / 0.25 >= 1.1)).alias("page_alert"),
    )


@register(
    "evt_dow_hour_heatmap",
    oracle="""
    SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           CAST(hour(ts) AS INTEGER) AS hod,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def evt_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekday × hour activity heatmap — the first chart every ops
    dashboard draws (when do users show up?). One hash aggregate over
    a ≤7×24-cell key space; the exact per-cell distinct-user count is
    the expensive exact path (one dedup Expand), swapped for HLL at
    100 TB with the identical join tree. dayofweek numbering differs
    across engines (G4): Spark Sun=1, DuckDB Sun=0 — reconciled in the
    oracle."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "evt_new_vs_returning_daily",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS first_d
      FROM events GROUP BY user_id
    )
    SELECT CAST(e.ts AS DATE) AS d,
           CAST(count(DISTINCT CASE WHEN CAST(e.ts AS DATE) = f.first_d
                                    THEN e.user_id END) AS BIGINT)
             AS new_users,
           CAST(count(DISTINCT CASE WHEN CAST(e.ts AS DATE) <> f.first_d
                                    THEN e.user_id END) AS BIGINT)
             AS returning_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1
    """,
)
def evt_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split — the growth dashboard's first
    breakdown: a user counts as NEW only on their first-seen calendar
    day, RETURNING on every later active day. Shape: the first-seen
    table is a per-user min (one user_id shuffle, map-side combinable)
    joined back co-partitioned on the same key, then one day-grain
    aggregate whose conditional distincts share a single dedup pass.
    Complements evt_cumulative_new_users (the accretion curve) and
    evt_resurrection_analysis (gap-based comebacks) with the daily
    operational view."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_d")
    )
    d = F.col("ts").cast("date")
    return (
        ev.join(first_seen, "user_id")
        .groupBy(d.alias("d"))
        .agg(
            F.countDistinct(
                F.when(d == F.col("first_d"), F.col("user_id"))
            ).alias("new_users"),
            F.countDistinct(
                F.when(d != F.col("first_d"), F.col("user_id"))
            ).alias("returning_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_TB_MAXL = 9223372036854775807
#: token bucket: capacity 1 token (µtoken units), cost 1 token/event,
#: refill 1 token per hour of EVENT time (1 µtoken per 3600 µs) — the
#: strict free-tier hourly quota; parameters chosen so the fixture
#: exercises both branches (sf0.01: 9196 admitted / 811 rejected)
_TB_CAP = 1_000_000
_TB_COST = 1_000_000
_TB_DIV = 3600

_TB_REF = (
    f"least({_TB_CAP}, s.tok + CASE WHEN s.lt = -1 THEN 0 "
    f"ELSE (e.t_us - s.lt) // {_TB_DIV} END)"
)

_TB_ORACLE = f"""
    -- the fold key is coalesce(user_id, MAXLONG): the recursive step
    -- advances via an EQUI-join on the key, and NULL = NULL never
    -- matches, so a NULL-user group (present in the hostile corpus)
    -- would stall at rank 0 and vanish from the output while Spark's
    -- groupBy keeps its NULL group; the sentinel is mapped back to
    -- NULL in the final projection
    WITH RECURSIVE ev AS (
      SELECT coalesce(user_id, {_TB_MAXL}) AS user_id,
             coalesce(epoch_us(CAST(ts AS TIMESTAMP)), {_TB_MAXL}) AS t_us,
             coalesce(event_id, {_TB_MAXL}) AS eid,
             row_number() OVER (
                 PARTITION BY user_id
                 ORDER BY coalesce(epoch_us(CAST(ts AS TIMESTAMP)),
                                   {_TB_MAXL}),
                          coalesce(event_id, {_TB_MAXL})) AS rk
      FROM events
    ), mx AS (
      SELECT user_id, CAST(max(rk) AS BIGINT) AS n FROM ev GROUP BY user_id
    ),
    -- NB: the fold is a RECURSIVE CTE (one step per event rank), not a
    -- list_reduce lambda: DuckDB 1.0's list_reduce over a struct
    -- accumulator with a multi-branch CASE returns chunk-dependent
    -- wrong results (ad+rj != element count for some groups, moving
    -- across connections) -- found while building this key; the
    -- recursive form is plain deterministic SQL
    step AS (
      SELECT user_id, CAST(0 AS BIGINT) AS rk,
             CAST({_TB_CAP} AS BIGINT) AS tok, CAST(-1 AS BIGINT) AS lt,
             CAST(0 AS BIGINT) AS ad, CAST(0 AS BIGINT) AS rj,
             CAST({_TB_MAXL} AS BIGINT) AS mr
      FROM mx
      UNION ALL
      SELECT s.user_id, s.rk + 1,
             CASE WHEN e.t_us = {_TB_MAXL} THEN s.tok
                  WHEN {_TB_REF} >= {_TB_COST} THEN {_TB_REF} - {_TB_COST}
                  ELSE {_TB_REF} END,
             CASE WHEN e.t_us = {_TB_MAXL} THEN s.lt ELSE e.t_us END,
             s.ad + CASE WHEN e.t_us <> {_TB_MAXL}
                              AND {_TB_REF} >= {_TB_COST}
                         THEN 1 ELSE 0 END,
             s.rj + CASE WHEN e.t_us = {_TB_MAXL} OR {_TB_REF} < {_TB_COST}
                         THEN 1 ELSE 0 END,
             CASE WHEN (e.t_us = {_TB_MAXL} OR {_TB_REF} < {_TB_COST})
                       AND e.eid <> {_TB_MAXL}
                  THEN least(s.mr, e.eid) ELSE s.mr END
      FROM step s JOIN ev e ON e.user_id = s.user_id AND e.rk = s.rk + 1
    )
    SELECT CASE WHEN s.user_id = {_TB_MAXL} THEN NULL
                ELSE s.user_id END AS user_id,
           s.ad + s.rj AS n_events,
           s.ad AS n_admitted,
           s.rj AS n_rejected,
           CASE WHEN s.mr = {_TB_MAXL} THEN NULL ELSE s.mr END
               AS min_rejected_event_id,
           s.tok AS final_tokens_u
    FROM step s JOIN mx USING (user_id) WHERE s.rk = mx.n
"""

_TB_FOLD_EXPR = f"""
    aggregate(
      evs,
      named_struct(
        'tok', CAST({_TB_CAP} AS BIGINT), 'lt', CAST(-1 AS BIGINT),
        'ad', CAST(0 AS BIGINT), 'rj', CAST(0 AS BIGINT),
        'mr', CAST({_TB_MAXL} AS BIGINT)),
      (acc, x) -> CASE
        WHEN x.t = {_TB_MAXL}L THEN named_struct(
          'tok', acc.tok, 'lt', acc.lt, 'ad', acc.ad,
          'rj', acc.rj + CAST(1 AS BIGINT),
          'mr', CASE WHEN x.e = {_TB_MAXL}L THEN acc.mr
                     ELSE least(acc.mr, x.e) END)
        WHEN least(CAST({_TB_CAP} AS BIGINT), acc.tok
                   + CASE WHEN acc.lt = -1L THEN CAST(0 AS BIGINT)
                          ELSE (x.t - acc.lt) div {_TB_DIV} END)
             >= {_TB_COST}L THEN named_struct(
          'tok', least(CAST({_TB_CAP} AS BIGINT), acc.tok
                   + CASE WHEN acc.lt = -1L THEN CAST(0 AS BIGINT)
                          ELSE (x.t - acc.lt) div {_TB_DIV} END)
                 - CAST({_TB_COST} AS BIGINT),
          'lt', x.t, 'ad', acc.ad + CAST(1 AS BIGINT), 'rj', acc.rj,
          'mr', acc.mr)
        ELSE named_struct(
          'tok', least(CAST({_TB_CAP} AS BIGINT), acc.tok
                   + CASE WHEN acc.lt = -1L THEN CAST(0 AS BIGINT)
                          ELSE (x.t - acc.lt) div {_TB_DIV} END),
          'lt', x.t, 'ad', acc.ad, 'rj', acc.rj + CAST(1 AS BIGINT),
          'mr', CASE WHEN x.e = {_TB_MAXL}L THEN acc.mr
                     ELSE least(acc.mr, x.e) END)
      END)
"""


@register("evt_token_bucket_admission", oracle=_TB_ORACLE)
def evt_token_bucket_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket admission control, batch form (WAVE10 candidate 3):
    per user, replay events in (event-time, event_id) order through a
    bucket of capacity 1 token refilling 1 token per hour of EVENT
    time; report admitted/rejected counts, the first rejected event,
    and the final bucket level — the strict hourly-quota decision an
    API gateway enforces, computed EXACTLY as an ordered integer fold.

    Exactness: all arithmetic is integer µtokens (refill = Δt_µs //
    3600), so the fold is bit-identical cross-engine; NULL event times
    are rejected deterministically WITHOUT touching the bucket (no
    clock, no refill — and since they neither read nor write state,
    their fold position cannot matter); NULL event_ids count as
    rejections but are excluded from min_rejected_event_id (both
    NULL-sentinels sort last via MAXLONG).

    Scale shape: ONE shuffle on user_id; the per-user ordered fold runs
    over a collect-sorted struct array, bounded by per-user activity —
    fine for gateway-grain keys, and the registered STREAMING twin
    (evt_token_bucket_admission_stream) is the corpus-scale path with
    O(1) state per user and no per-user array at all. The decision
    sequence is inherently sequential per key (each admission changes
    the state the next one reads), so a window rewrite cannot express
    it — this collect-fold IS the honest batch form."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.coalesce(
            F.unix_micros(F.col("ts").cast("timestamp")), F.lit(_TB_MAXL)
        ).alias("t"),
        F.coalesce("event_id", F.lit(_TB_MAXL)).alias("e"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "e"))).alias("evs")
    )
    folded = per_user.select(
        "user_id", F.expr(_TB_FOLD_EXPR).alias("st")
    )
    return folded.select(
        "user_id",
        (F.col("st.ad") + F.col("st.rj")).alias("n_events"),
        F.col("st.ad").alias("n_admitted"),
        F.col("st.rj").alias("n_rejected"),
        F.when(F.col("st.mr") == _TB_MAXL, F.lit(None).cast("bigint"))
        .otherwise(F.col("st.mr"))
        .alias("min_rejected_event_id"),
        F.col("st.tok").alias("final_tokens_u"),
    )


@register(
    "evt_token_bucket_admission_stream",
    oracle=_TB_ORACLE,
    tags=("streaming",),
)
def evt_token_bucket_admission_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING form of evt_token_bucket_admission, registered as its
    own driver-oracled key (WAVE10 candidate 3, the admission-control
    sibling of evt_rate_limit_burst_stream): the events fixture is
    fanned into a time-ordered 3-file stream, replayed with
    maxFilesPerTrigger=1 through the applyInPandasWithState fold in
    streaming.stream_token_bucket_admission (O(1) five-integer state
    per user), and the last emission per user
    must hash-match the SAME recursive-CTE oracle the batch fold key
    carries — driver-certifying that a live quota gate and its batch
    audit recomputation can never disagree.

    Scale: this IS the production form of the quota gate — the batch
    twin's per-user collect-fold is the audit/backfill path; the stream
    holds five integers per user and shuffles on the same user_id
    layout. Refill depends on inter-event gaps, so cross-batch
    correctness requires the time-ordered ingest frontier (documented
    in the processor; the batch-cut sweep proves cut-independence on
    that frontier)."""
    from .. import streaming as st
    from .scans import _scratch, _sf_tag

    src = _scratch("stream_tb", _sf_tag(sf_dir), "events")
    st.prepare_stream_source_timeordered(spark, sf_dir, src, n_files=3)
    _RLB_SEQ[0] += 1
    name = f"tb_stream_{_RLB_SEQ[0]}"
    st.run_to_memory(
        st.stream_token_bucket_admission(
            # NoTimeout ON PURPOSE — same measured reversal as
            # evt_rate_limit_burst_stream: the watermark path late-
            # filters rows at-or-behind the watermark (epoch-zero
            # defaults from the first batch), which the oracle's fold
            # counts; evict=True is the bounded-feed production
            # variant (see test_streaming_eviction)
            st.read_events_stream(spark, src, max_files_per_trigger=1)
        ),
        name,
        "update",
    )
    emitted = spark.table(name)
    final = emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("n_admitted", "n_events").alias("n_admitted"),
        F.max_by("n_rejected", "n_events").alias("n_rejected"),
        F.max_by("min_rejected_event_id", "n_events").alias(
            "min_rejected_event_id"
        ),
        F.max_by("final_tokens_u", "n_events").alias("final_tokens_u"),
    )
    # same memory-sink hygiene as evt_rate_limit_burst_stream: pin the
    # K-row final answer, release the emission history (ADVICE r10)
    out = final.localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


@register(
    "evt_exactly_once_sink_sim",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           max(ts) AS last_ts,
           CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
                AS BIGINT) AS value_cents
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming",),
)
def evt_exactly_once_sink_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end EXACTLY-ONCE streaming sink, registered and oracled
    (WAVE13 candidate 1): the events fixture streams through a
    foreachBatch two-phase versioned fold into a keyed parquet serving
    table, the query is KILLED right after a mid-stream batch's sink
    commit but before its checkpoint commit (the at-least-once replay
    window), restarted from the same checkpoint, and drained — and the
    resulting table must HASH-MATCH the plain batch aggregation of the
    whole fixture. No duplicates from the replayed batch (its committed
    version marker short-circuits the merge), no holes from the killed
    run (unprocessed batches replay from the checkpoint). The oracle is
    the batch answer, so the driver's gate certifies the whole
    kill-restart-converge story, not a local test alone.

    Scale shape: per-batch cost is O(batch + serving table) — the
    merge is one null-safe full-outer equi-join on the serving key
    (NULL user_id merges as ONE key, matching groupBy semantics);
    at production scale the table side stays bucketed on user_id and
    the rewrite narrows to touched partitions. The commit protocol
    (versioned sink + checkpoint restart) is the contract a 24/7
    ingest deploys; crash-window coverage beyond the registered kill
    point — torn writes, old-batch replays, backup-restore — is pinned
    in tests/test_streaming.py's _fold_versioned suite."""
    import os
    import shutil
    import tempfile

    from .. import streaming as st
    from .scans import _scratch, _sf_tag

    src = _scratch("stream_x1", _sf_tag(sf_dir), "events")
    st.prepare_stream_source_timeordered(spark, sf_dir, src, n_files=4)
    work = tempfile.mkdtemp(prefix="x1_sink_")
    target = os.path.join(work, "serving")
    ckpt = os.path.join(work, "ckpt")
    try:
        killed = st.run_exactly_once_sink(
            spark, src, target, ckpt, files_per_batch=1,
            crash_on_nth_commit=2,
        )
        resumed = st.run_exactly_once_sink(
            spark, src, target, ckpt, files_per_batch=1
        )
        if len(killed) == 2:
            # the kill fired (multi-batch corpus): the killed batch's
            # checkpoint never committed, so the restart MUST have
            # replayed it — exactly the dupe hazard the versioned fold
            # absorbs. (Degenerate single-batch corpora never reach the
            # kill point; the restart is then legitimately a no-op.)
            assert killed[-1] in resumed, (killed, resumed)
        out = (
            spark.read.parquet(target)
            .select(
                "user_id",
                "n_events",
                # serving table stores instants (stream watermark
                # contract); present NTZ like every batch twin
                F.col("last_ts").cast("timestamp_ntz").alias("last_ts"),
                # coalesced on BOTH sides: the merge's coalesce(x,0)+…
                # folds an all-NULL-value user to 0 after its second
                # batch, so a raw NULL (single-batch case) must present
                # as 0 too, batch-cut-independently
                F.coalesce("value_cents", F.lit(0)).alias("value_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "evt_exactly_once_sink_partitioned_sim",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
                AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def evt_exactly_once_sink_partitioned_sim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITIONED exactly-once streaming sink (the touched-partitions
    production shape): the events stream folds into a day-partitioned
    serving table via a per-(batch, partition) version ledger, the
    query is KILLED mid-batch — after the batch's FIRST day partition
    committed but before its checkpoint commit, a torn multi-partition
    write — restarted, and drained; the table must hash-match the
    batch per-(day, type) aggregation. The replay skips the day whose
    version committed and folds the rest: partition-grain
    exactly-once, not just whole-table. Untouched-partition immutability
    (later batches never rewrite earlier days' files) is checksummed in
    tests/test_streaming.py.

    Scale shape: per-batch cost is O(batch + touched partitions) — the
    time-ordered feed touches a bounded day span per trigger; untouched
    partitions are never read or written (the whole-table sibling
    rewrites O(table) per batch, this one does not); the touched-day
    driver hop is partition-count-bounded. This is the plan shape a
    24/7 partitioned ingest (dynamic partition overwrite + commit
    ledger) actually deploys."""
    import os
    import shutil
    import tempfile

    from .. import streaming as st
    from .scans import _scratch, _sf_tag

    src = _scratch("stream_x1", _sf_tag(sf_dir), "events")
    st.prepare_stream_source_timeordered(spark, sf_dir, src, n_files=4)
    work = tempfile.mkdtemp(prefix="x1p_sink_")
    target = os.path.join(work, "serving")
    ckpt = os.path.join(work, "ckpt")
    try:
        killed = st.run_exactly_once_sink_partitioned(
            spark, src, target, ckpt, files_per_batch=1,
            crash_in_nth_batch=2,
        )
        resumed = st.run_exactly_once_sink_partitioned(
            spark, src, target, ckpt, files_per_batch=1
        )
        killed_bids = {c[0] for c in killed}
        if len(killed_bids) == 2:
            # the kill fired on the 2nd batch's first partition: the
            # restart must replay that batch (same batch id appears),
            # re-visit the already-committed (batch, day) — and SKIP
            # its merge (merged=False), while merging the batch's
            # remaining days for the first time
            kb, kd, km = killed[-1]
            assert km, killed  # the pre-kill fold really merged
            replays = {(b, d): m for b, d, m in resumed}
            assert (kb, kd) in replays, (killed, resumed)
            assert replays[(kb, kd)] is False, (killed, resumed)
            assert any(
                b == kb and d != kd and m for b, d, m in resumed
            ), resumed
        if not os.path.isdir(target):
            return spark.createDataFrame(
                [],
                "day date, event_type string, n_events bigint, "
                "value_cents bigint",
            )
        out = (
            spark.read.parquet(target)
            .select(
                F.col("day").cast("date").alias("day"),
                "event_type",
                "n_events",
                F.coalesce("value_cents", F.lit(0)).alias("value_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


_QUAR_LO, _QUAR_HI = "2024-01-01 00:00:00", "2024-01-31 23:59:59"


@register(
    "evt_stream_quarantine_split",
    oracle=f"""
    SELECT CASE WHEN ts IS NULL THEN 'null_ts'
                WHEN ts < TIMESTAMP '{_QUAR_LO}' THEN 'before_window'
                WHEN ts > TIMESTAMP '{_QUAR_HI}' THEN 'after_window'
                ELSE 'admitted' END AS disposition,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
                AS BIGINT) AS value_cents,
           CAST(min(event_id) AS BIGINT) AS min_event_id,
           CAST(max(event_id) AS BIGINT) AS max_event_id
    FROM events
    GROUP BY 1, 2
    """,
)
def evt_stream_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine routing for event-time plausibility (WAVE14
    candidate 2) — the production contract
    streaming.bound_event_time's docstring promises: instead of
    dropping rows outside the plausibility window on the floor, ONE
    scan-stage classification routes every event to a disposition —
    null_ts / before_window / after_window / admitted — and the census
    carries counts, cent-exact value totals, and min/max event_id per
    (disposition, type) as the reprocessing provenance pointers. The
    'admitted' branch is definitionally bound_event_time's output
    (same [lo, hi] comparison), so wiring this census upstream of a
    watermarked stream is a pure filter swap; the quarantined rows go
    to their own sink instead of vanishing.

    Why it matters at 100 TB: a single future-dated row poisons a
    stream's watermark and silently evicts all legitimate traffic
    (test_stream_watermark_poison_guard demonstrates it live); the
    quarantine table is how an on-call engineer SEES the poison — the
    hostile corpus populates before_window (epoch default) and
    after_window (2030 producer clock) exactly as a real feed would.
    One scan, zero state, one stage-cardinality groupBy."""
    ev = load(spark, sf_dir, "events")
    lo = F.lit(_QUAR_LO).cast("timestamp_ntz")
    hi = F.lit(_QUAR_HI).cast("timestamp_ntz")
    disp = (
        F.when(F.col("ts").isNull(), "null_ts")
        .when(F.col("ts") < lo, "before_window")
        .when(F.col("ts") > hi, "after_window")
        .otherwise("admitted")
    )
    return ev.groupBy(disp.alias("disposition"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.coalesce(
            F.sum(F.round(F.col("value") * 100).cast("bigint")), F.lit(0)
        ).alias("value_cents"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


@register(
    "evt_exactly_once_sink_evolving_sim",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           max(ts) AS last_ts,
           CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
                AS BIGINT) AS value_cents,
           CAST(coalesce(sum(CASE WHEN (coalesce(event_id, 0) & 3) >= 2
                                  THEN (coalesce(event_id, 0) & 7)
                                  ELSE 0 END), 0) AS BIGINT) AS flag_sum
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming",),
)
def evt_exactly_once_sink_evolving_sim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCHEMA-EVOLVING exactly-once streaming sink (WAVE15 candidate
    5): the exactly-once foreachBatch sink is killed mid-replay under
    the generation-1 source schema; the source then EVOLVES — new
    files arrive carrying an added ``flag_val`` column — and the query
    restarts from the same checkpoint with the WIDENED schema. The
    restart must (a) replay the killed batch idempotently (version
    marker skips the merge), (b) read pre-evolution files under the
    widened schema (parquet null-fills the absent column), and (c)
    WIDEN the standing state table written before the evolution
    instead of losing or forking it. The serving table must hash-match
    the batch aggregate over BOTH generations — the oracle computes
    the widened answer from the base table, so the driver's gate
    certifies the full kill → evolve → restart → converge story.

    The new column's derivation (``event_id & 7`` on gen-2 rows,
    ``(event_id & 3) >= 2`` membership) uses two's-complement bitwise
    ops — identical in Spark and DuckDB even on hostile negative ids,
    where ``%`` diverges (Spark pmod vs DuckDB signed rem, gotcha
    G15's sibling).

    Scale shape: identical per-batch cost to evt_exactly_once_sink_sim
    (one null-safe serving-key merge per batch); schema evolution adds
    ZERO passes — old files are never rewritten (the
    scan_schema_evolution_sim economics), the widening is a metadata
    default applied at read and merge time."""
    import os
    import shutil
    import tempfile

    from pyspark.sql.types import IntegerType, StructField, StructType

    from .. import streaming as st
    from .scans import _scratch, _sf_tag

    g1 = _scratch("stream_xev1", _sf_tag(sf_dir), "events")
    g2 = _scratch("stream_xev2", _sf_tag(sf_dir), "events")
    st.prepare_stream_source_evolving(spark, sf_dir, g1, g2)
    work = tempfile.mkdtemp(prefix="xev_sink_")
    src = os.path.join(work, "src")
    target = os.path.join(work, "serving")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    def _adopt(gen_dir: str, tag: str, base_mt: float) -> int:
        n = 0
        for i, f in enumerate(
            sorted(
                p for p in os.listdir(gen_dir) if p.endswith(".parquet")
            )
        ):
            dst = os.path.join(src, f"{tag}{i:02d}.parquet")
            shutil.copyfile(os.path.join(gen_dir, f), dst)
            mt = base_mt + i * 60
            os.utime(dst, (mt, mt))
            n += 1
        return n

    try:
        import time as _time

        now = _time.time()
        n1 = _adopt(g1, "gen1_", now - 1200)
        # an empty generation (degenerate corpus) has no part files to
        # infer from — the base fixture schema is the gen-1 schema by
        # construction
        schema1 = (
            spark.read.parquet(g1).schema
            if n1
            else load(spark, sf_dir, "events").schema
        )
        killed = st.run_exactly_once_sink_evolving(
            spark, src, target, ckpt, schema1, files_per_batch=1,
            crash_on_nth_commit=1,
        )
        # the EVOLUTION: gen-2 files (with flag_val) arrive, and the
        # restart reads everything under the widened schema
        n2 = _adopt(g2, "gen2_", now - 600)
        schema2 = (
            spark.read.parquet(g2).schema
            if n2
            else StructType(
                list(schema1.fields)
                + [StructField("flag_val", IntegerType())]
            )
        )
        assert "flag_val" in schema2.fieldNames()
        assert isinstance(
            schema2["flag_val"], StructField
        ) and isinstance(schema2["flag_val"].dataType, IntegerType)
        resumed = st.run_exactly_once_sink_evolving(
            spark, src, target, ckpt, schema2, files_per_batch=1
        )
        if n1 >= 1 and killed:
            # the kill fired after gen-1's first batch committed its
            # sink version but not its checkpoint: the widened restart
            # MUST replay that batch (idempotently) before the gen-2
            # files — the pre-evolution state-widening path is provably
            # exercised, not skipped
            assert killed[-1] in resumed, (killed, resumed)
        if not os.path.isdir(target):
            return spark.createDataFrame(
                [],
                "user_id bigint, n_events bigint, last_ts timestamp_ntz, "
                "value_cents bigint, flag_sum bigint",
            )
        out = (
            spark.read.parquet(target)
            .select(
                "user_id",
                "n_events",
                F.col("last_ts").cast("timestamp_ntz").alias("last_ts"),
                F.coalesce("value_cents", F.lit(0)).alias("value_cents"),
                F.coalesce("flag_sum", F.lit(0)).alias("flag_sum"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "evt_distinct_users_stream",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY event_type
    """,
    tags=("streaming",),
)
def evt_distinct_users_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT streaming distinct-count (WAVE17): per-type distinct
    users maintained incrementally as roaring-style bitmap state
    (streaming.fold_distinct_census — agg_bitmap_distinct_rollup's
    partials as a foreachBatch fold under the two-phase versioned
    commit). Bitmap OR is commutative and idempotent, so the fold is
    order-free AND replay-absorbing by algebra, not just by the
    version ledger; the final census must hash-match the plain
    count(DISTINCT) oracle — the daily-uniques table maintained on the
    ingest path with EXACT answers, where the usual streaming answer
    (approx_count_distinct state) trades accuracy for state size.

    Scale shape: per batch — one (type, bucket) partial aggregate
    (map-side combined) and one state-merge groupBy over bitmap blobs;
    state is O(distinct users / 64) rows, never raw IDs re-scanned.
    The HLL fold (run_streaming_countmin_merge's sibling machinery)
    remains the unbounded-domain escape hatch; bitmaps are the exact
    answer for ID-like domains."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from .. import streaming as st
    from .scans import _scratch, _sf_tag

    src = _scratch("stream_x1", _sf_tag(sf_dir), "events")
    st.prepare_stream_source_timeordered(spark, sf_dir, src, n_files=4)
    work = _tempfile.mkdtemp(prefix="distinct_stream_")
    target = _os.path.join(work, "census")
    ckpt = _os.path.join(work, "ckpt")
    try:
        n = st.run_distinct_census_stream(
            spark, src, target, ckpt, files_per_batch=1
        )
        if not _os.path.isdir(target) or n == 0:
            return spark.createDataFrame(
                [], "event_type string, n_users bigint"
            )
        state = spark.read.parquet(target)
        out = (
            state.groupBy("event_type")
            .agg(
                F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "evt_rate_limit_stream_evicting",
    oracle=f"""
    WITH adm AS (
      SELECT * FROM events
      WHERE ts >= TIMESTAMP '{_QUAR_LO}' AND ts <= TIMESTAMP '{_QUAR_HI}'
    ), seq AS (
      SELECT user_id,
             CAST(count(*) OVER (
                 PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN 60000000 PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS burst
      FROM adm
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           max(burst) AS max_burst_60s,
           max(burst) >= 3 AS over_limit
    FROM seq
    GROUP BY user_id
    """,
    tags=("streaming",),
)
def evt_rate_limit_stream_evicting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of the streaming rate limiter, registered
    and oracled (WAVE18 candidate 1, closing the WAVE11/12 arc): the
    feed first passes the ingest plausibility guard
    (streaming.bound_event_time over the quarantine window — the
    admitted branch of evt_stream_quarantine_split), and only then the
    applyInPandasWithState burst accounting WITH state eviction armed
    (watermark + EventTimeTimeout timers pruning idle users' buffers).
    The round-11 measured reversal stands for UNBOUNDED feeds — a
    watermark late-filters rows at-or-behind it and the epoch-zero
    default timestamp is lost from the first batch — which is exactly
    why this key's contract is the bounded feed: the oracle restricts
    the batch window form to the SAME [lo, hi] admission, so the
    driver's hash gate certifies the full production composition
    (quarantine bound → watermark → evicting state) rather than a
    clean-fixture special case. The NoTimeout sibling
    (evt_rate_limit_burst_stream) remains the arbitrary-input form.

    Correctness argument (pinned executable in
    tests/test_streaming_eviction.py and the batch-cut sweep): on the
    time-ordered frontier every batch's minimum admitted event time
    exceeds the prior watermark, so late-filtering never touches an
    admitted row; eviction only prunes buffer entries older than any
    window a future event can open (monotone-safe), and the three
    counters surviving eviction are the key's whole answer-state.

    Scale shape: identical shuffle to the sibling (one user_id state
    layout); eviction is what makes 24/7 state O(active users), not
    O(ever-seen users)."""
    from .. import streaming as st
    from .scans import _scratch, _sf_tag

    src = _scratch("stream_rlb", _sf_tag(sf_dir), "events")
    st.prepare_stream_source_timeordered(spark, sf_dir, src, n_files=3)
    _RLB_SEQ[0] += 1
    name = f"rlb_evict_stream_{_RLB_SEQ[0]}"
    st.run_to_memory(
        st.stream_rate_limit_stats(
            st.bound_event_time(
                st.read_events_stream(spark, src, max_files_per_trigger=1),
                _QUAR_LO,
                _QUAR_HI,
            ),
            evict=True,
        ),
        name,
        "update",
    )
    emitted = spark.table(name)
    final = emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("max_burst_60s", "n_events").alias("max_burst_60s"),
        F.max_by("over_limit", "n_events").alias("over_limit"),
    )
    out = final.localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out
