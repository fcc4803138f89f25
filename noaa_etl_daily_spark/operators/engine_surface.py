"""Engine-surface operators: SQL-language UDFs, SQL table functions,
session variables, hidden ``_metadata`` columns, and observed metrics.

These cover the declarative extension points a production Spark shop
actually uses instead of Python UDFs: SQL scalar/table functions are
**inlined by Catalyst into whole-stage codegen** (the plan shows the
substituted expression, no UDF call node — verified in the layout
tests), so they carry zero serialization cost at 100 TB; session
variables are the engine-native form of the "compute a threshold once,
then broadcast it" discipline; ``_metadata`` gives per-row file lineage
straight from the scan operator (no join against a manifest); and
``observe()`` piggybacks data-quality counters onto an existing action
(CollectMetrics node) so QC never costs a second pass over the corpus.

No reference ``file:line`` citations are possible (SURVEY.md §0: the
reference checkout is empty); parity targets are the driver contract
and SURVEY.md §2's normative inventory.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load, path_for

#: Oracles that read parquet FILES (not the pre-registered table views)
#: must template the same fixture dir the harness binds its views to
#: (conftest honors SPARK_GRAFT_TEST_SF_DIR; the driver always runs the
#: default) — the scan_parquet_footer_census convention.
_ORACLE_SF_DIR = _os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"
)


@register(
    "sql_udf_create_function",
    oracle="""
    SELECT l_returnflag,
           CASE WHEN l_discount < 0.03 THEN 'low'
                WHEN l_discount < 0.07 THEN 'mid'
                ELSE 'high' END AS band,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 100) AS BIGINT))
                AS BIGINT) AS net_cents,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * (1 + l_tax) * 100) AS BIGINT))
                      AS DOUBLE)
                 / count(*) / 100, 2) AS avg_net
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def sql_udf_create_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scalar UDFs (Spark 4 ``CREATE FUNCTION … RETURN``):
    a net-price-in-cents function and a discount-band classifier,
    declared once and reused across the query.

    Why this is the right UDF tier: Catalyst INLINES the function body
    into the caller's plan — the physical plan shows the substituted
    arithmetic inside the partial aggregate, no UDF evaluation node, so
    the query keeps whole-stage codegen and vectorized reads (the
    layout test asserts no BatchEvalPython/ArrowEvalPython appears).
    A row-at-a-time Python UDF computing the same thing would move
    every row across the JVM↔Python boundary; the SQL function moves
    none. Integer-cents rounding inside the function makes the sums
    order-independent and engine-exact.

    Scale design: one scan, one partial+final hash aggregate on
    (returnflag, band) — identical to the hand-inlined plan at any
    corpus size. Function definitions are session catalog metadata
    (zero per-row cost, no shuffle)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "li_sqludf_src"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_cents_f(
            price DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS BIGINT
        RETURN CAST(round(price * (1 - disc) * (1 + tax) * 100) AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_band_f(d DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN d < 0.03 THEN 'low'
                    WHEN d < 0.07 THEN 'mid'
                    ELSE 'high' END
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               disc_band_f(l_discount) AS band,
               count(*) AS n,
               sum(net_cents_f(l_extendedprice, l_discount, l_tax))
                   AS net_cents,
               round(CAST(sum(net_cents_f(l_extendedprice, l_discount,
                                          l_tax)) AS DOUBLE)
                     / count(*) / 100, 2) AS avg_net
        FROM li_sqludf_src
        GROUP BY 1, 2
        ORDER BY 1, 2
        """
    )


@register(
    "sql_table_function_create",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY 1
    ORDER BY 1
    """,
)
def sql_table_function_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table function (``CREATE FUNCTION … RETURNS TABLE``): a
    parameterized relation — "orders in a given status" — declared once
    and queried like a table (``FROM orders_in_status('F')``).

    Like scalar SQL UDFs, Spark inlines the function body: the plan is
    the plain filtered scan + aggregate, with the ``o_orderstatus =
    'F'`` predicate PUSHED INTO the parquet scan exactly as if the view
    were written by hand. This is the engine-native way to publish a
    reusable parameterized dataset contract to downstream teams — the
    100 TB benefit is that every consumer inherits pushdown/pruning
    instead of post-filtering a materialized export.

    Scale design: scan (with pushed filter) → one partial+final hash
    aggregate on priority; the function is catalog metadata only."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("ord_tvf_src")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION orders_in_status(st STRING)
        RETURNS TABLE (o_orderkey BIGINT, o_totalprice DOUBLE,
                       o_orderpriority STRING)
        RETURN SELECT CAST(o_orderkey AS BIGINT), o_totalprice,
                      o_orderpriority
               FROM ord_tvf_src WHERE o_orderstatus = st
        """
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders_in_status('F')
        GROUP BY 1
        ORDER BY 1
        """
    )


@register(
    "sql_session_variables",
    oracle="""
    WITH th AS (
        SELECT quantile_cont(o_totalprice, 0.9) AS p90 FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents,
           round(min(o.o_totalprice), 2) AS lowest_kept
    FROM orders o, th
    WHERE o.o_totalprice > th.p90
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 ``DECLARE VARIABLE`` / ``SET
    VAR``): compute the order-value p90 once, bind it to a session
    variable, and filter against it — the engine-native spelling of the
    repo's "threshold as a broadcast scalar" discipline
    (evt_power_users computes the same shape declaratively via a 1-row
    crossJoin).

    Honest cost note: ``SET VAR`` evaluates its subquery EAGERLY (one
    percentile aggregate job over orders) — that is the feature's
    semantics, a deliberate one-time reduction whose result is then
    constant-folded into every consumer's plan (the final plan filters
    on a LITERAL, so the scan gets a pushed comparison, not a join).
    At 100 TB the eager job is one map-combined aggregate; the
    percentile would move to an ``approx_percentile``/KLL sketch with
    the same variable plumbing.

    Exactness: Spark ``percentile`` and DuckDB ``quantile_cont`` share
    linear interpolation on the same value multiset; sums are integer
    cents."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("ord_var_src")
    spark.sql("DECLARE OR REPLACE VARIABLE order_p90 DOUBLE")
    spark.sql(
        "SET VAR order_p90 = "
        "(SELECT percentile(o_totalprice, 0.9) FROM ord_var_src)"
    )
    return spark.sql(
        """
        SELECT count(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
               round(min(o_totalprice), 2) AS lowest_kept
        FROM ord_var_src
        WHERE o_totalprice > order_p90
        """
    )


@register(
    "scan_file_metadata_column",
    oracle=f"""
    SELECT parse_filename(filename) AS file_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(max(file_row_number) AS BIGINT) AS max_row_index,
           CAST(CAST(sum(o_orderkey * (file_row_number + 1)) AS HUGEINT)
                AS DOUBLE) AS position_checksum
    FROM parquet_scan('{_ORACLE_SF_DIR}/orders.parquet',
                      filename=true, file_row_number=true)
    GROUP BY 1
    ORDER BY 1
    """,
)
def scan_file_metadata_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden ``_metadata`` scan columns: per-row file lineage
    (``_metadata.file_name``) and in-file position
    (``_metadata.row_index``) surfaced by the parquet scan operator
    itself — no manifest join, no ``input_file_name()`` UDF.

    The ``position_checksum`` (Σ o_orderkey·(row_index+1)) is
    position-SENSITIVE: it hash-matches DuckDB's ``file_row_number``
    only if the two engines agree on every row's ordinal within the
    file, which certifies the lineage column at row granularity, not
    just per-file counts. Accumulated in decimal(38,0) ↔ HUGEINT, then
    cast to double (both engines round-to-nearest the same integer).

    Scale design / why it matters at 100 TB: ``_metadata`` is produced
    during the scan (zero extra IO — the reader already knows the file
    and position), so per-file audits, CDC row addressing, and
    corrupted-file triage group on `file_name` with one shuffle of
    per-file partial aggregates. At real scale this query is the
    "which files feed this table, and are their row counts what the
    manifest says" audit."""
    df = load(spark, sf_dir, "orders")
    return (
        df.select(
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.row_index").alias("ri"),
            "o_orderkey",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("ri").alias("max_row_index"),
            # operands cast to decimal(38,0) BEFORE the multiply so the
            # per-row product (not just the sum) is overflow-safe — a
            # LONG product would silently wrap under non-ANSI Spark at
            # the very scales this lineage audit targets
            F.sum(
                F.col("o_orderkey").cast("decimal(38,0)")
                * (F.col("ri") + F.lit(1)).cast("decimal(38,0)")
            )
            .cast("double")
            .alias("position_checksum"),
        )
        .orderBy("file_name")
    )


@register(
    "validate_observe_metrics",
    oracle="""
    SELECT l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS gross_cents
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
)
def validate_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality counters via ``observe()`` (CollectMetrics): the
    pipeline's main aggregate runs unchanged, while row-count,
    null-count and out-of-domain counters are collected AS A SIDE
    EFFECT of the same action — the driver-side ``Observation`` object
    yields them after any collect, and tests/test_engine_surface.py
    asserts they match the oracle's own counts.

    Why this shape at 100 TB: the naive QC alternative is a second job
    (``df.count()`` + rule filters) that re-reads the corpus; observe()
    attaches an accumulator-style CollectMetrics node to the EXISTING
    scan, so validation is free — same files read once, metrics folded
    per task. The returned DataFrame (the oracled surface) is the
    unchanged business aggregate, proving observation costs nothing in
    plan shape.

    The observation object is created fresh per call (unique identity)
    so repeated runs in one session never collide."""
    obs = Observation()
    df = load(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.sum((F.col("l_discount") > 0.10).cast("long")).alias(
            "disc_over_cap"
        ),
    )
    return (
        df.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("gross_cents"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "agg_linear_regression_normal_eq",
    oracle="""
    WITH q AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
               CAST(round(l_discount * 100) AS BIGINT) AS x2,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x1) AS HUGEINT) AS sx1,
               CAST(sum(x2) AS HUGEINT) AS sx2,
               CAST(sum(y) AS HUGEINT) AS sy,
               -- operands widen BEFORE the multiply: a hostile 1e9
               -- price gives y=1e11 cents, y*y=1e22 > BIGINT range
               CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS sx11,
               CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS sx12,
               CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS sx22,
               CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS sx1y,
               CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS sx2y,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM q
    ),
    d AS (
        SELECT n,
               CAST(n AS DOUBLE) AS dn,
               CAST(sx1 AS DOUBLE) AS a12, CAST(sx2 AS DOUBLE) AS a13,
               CAST(sx11 AS DOUBLE) AS a22, CAST(sx12 AS DOUBLE) AS a23,
               CAST(sx22 AS DOUBLE) AS a33,
               CAST(sy AS DOUBLE) AS b1, CAST(sx1y AS DOUBLE) AS b2,
               CAST(sx2y AS DOUBLE) AS b3, CAST(syy AS DOUBLE) AS dyy
        FROM m
    ),
    s AS (
        SELECT n, dn, b1, b2, b3, dyy,
               dn * (a22 * a33 - a23 * a23)
                 - a12 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * a23 - a22 * a13) AS det,
               b1 * (a22 * a33 - a23 * a23)
                 - a12 * (b2 * a33 - a23 * b3)
                 + a13 * (b2 * a23 - a22 * b3) AS det0,
               dn * (b2 * a33 - b3 * a23)
                 - b1 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * b3 - b2 * a13) AS det1,
               dn * (a22 * b3 - a23 * b2)
                 - a12 * (a12 * b3 - b2 * a13)
                 + b1 * (a12 * a23 - a22 * a13) AS det2
        FROM d
    )
    SELECT n,
           round(det0 / det, 6) AS b0_cents,
           round(det1 / det, 6) AS b1_cents_per_unit,
           round(det2 / det, 6) AS b2_cents_per_disc_pct,
           round(1 - (dyy - (det0 / det) * b1 - (det1 / det) * b2
                          - (det2 / det) * b3)
                     / (dyy - b1 * b1 / dn), 6) AS r2
    FROM s
    """,
)
def agg_linear_regression_normal_eq(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-feature OLS (extendedprice ~ quantity + discount, with
    intercept) solved in CLOSED FORM from normal-equation moments — the
    distributed regression recipe: one map-combined aggregate produces
    the 3×3 Gram matrix and response moments, Cramer's rule inverts it
    on the single output row. No gradient loop, no driver collect of
    data, no ml-library dependency.

    Exactness: inputs are quantized to integer units (quantity,
    discount in pct points, price in cents) so every moment is an
    EXACT integer accumulated in decimal(38,0) ↔ HUGEINT (y² products
    reach ~1e14/row — bigint sums would overflow near 1e4 rows, the
    llm_zipf_exponent_fit overflow class). Both engines then evaluate
    the IDENTICAL double expression tree on identical integers, so the
    rounded coefficients and R² are bit-stable cross-engine.

    Scale design: corpus → ONE 10-value moment row (map-side combine
    does almost all the work); the solve is O(1) driver-free
    arithmetic. At 100 TB this plan is unchanged — moments are the
    canonical mergeable state for linear models (the same trick powers
    regr_slope and the ANOVA/Tukey operators)."""
    li = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_quantity")).cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x1"))).alias("sx1"),
        F.sum(dec(F.col("x2"))).alias("sx2"),
        F.sum(dec(F.col("y"))).alias("sy"),
        # operands widen BEFORE the multiply (G11 overflow class): a
        # hostile 1e9 price gives y=1e11 cents, y*y=1e22 > LONG range
        F.sum(dec(F.col("x1")) * dec(F.col("x1"))).alias("sx11"),
        F.sum(dec(F.col("x1")) * dec(F.col("x2"))).alias("sx12"),
        F.sum(dec(F.col("x2")) * dec(F.col("x2"))).alias("sx22"),
        F.sum(dec(F.col("x1")) * dec(F.col("y"))).alias("sx1y"),
        F.sum(dec(F.col("x2")) * dec(F.col("y"))).alias("sx2y"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("syy"),
    )
    d = m.select(
        "n",
        F.col("n").cast("double").alias("dn"),
        F.col("sx1").cast("double").alias("a12"),
        F.col("sx2").cast("double").alias("a13"),
        F.col("sx11").cast("double").alias("a22"),
        F.col("sx12").cast("double").alias("a23"),
        F.col("sx22").cast("double").alias("a33"),
        F.col("sy").cast("double").alias("b1"),
        F.col("sx1y").cast("double").alias("b2"),
        F.col("sx2y").cast("double").alias("b3"),
        F.col("syy").cast("double").alias("dyy"),
    )
    a12, a13 = F.col("a12"), F.col("a13")
    a22, a23, a33 = F.col("a22"), F.col("a23"), F.col("a33")
    b1, b2, b3 = F.col("b1"), F.col("b2"), F.col("b3")
    dn, dyy = F.col("dn"), F.col("dyy")
    det = (
        dn * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    det0 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    )
    det1 = (
        dn * (b2 * a33 - b3 * a23)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    )
    det2 = (
        dn * (a22 * b3 - a23 * b2)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    )
    s = d.select(
        "n",
        dn.alias("dn"),
        b1.alias("b1"),
        b2.alias("b2"),
        b3.alias("b3"),
        dyy.alias("dyy"),
        det.alias("det"),
        det0.alias("det0"),
        det1.alias("det1"),
        det2.alias("det2"),
    )
    det_, det0_ = F.col("det"), F.col("det0")
    det1_, det2_ = F.col("det1"), F.col("det2")
    b1_, b2_, b3_ = F.col("b1"), F.col("b2"), F.col("b3")
    dn_, dyy_ = F.col("dn"), F.col("dyy")
    # degenerate Gram matrix (constant features) ⇒ det = 0: coefficients
    # are undefined — try_divide ≡ DuckDB's NULL-on-zero-division (G11)
    return s.select(
        "n",
        F.round(F.try_divide(det0_, det_), 6).alias("b0_cents"),
        F.round(F.try_divide(det1_, det_), 6).alias("b1_cents_per_unit"),
        F.round(F.try_divide(det2_, det_), 6).alias("b2_cents_per_disc_pct"),
        F.round(
            1
            - F.try_divide(
                dyy_
                - F.try_divide(det0_, det_) * b1_
                - F.try_divide(det1_, det_) * b2_
                - F.try_divide(det2_, det_) * b3_,
                dyy_ - b1_ * b1_ / dn_,
            ),
            6,
        ).alias("r2"),
    )


def _fh_bucket_sql(k: int) -> str:
    return (
        "len(list_filter(toks, t -> "
        f"(CAST(('0x' || substr(md5(t), 1, 4)) AS INTEGER) % 16) = {k}))"
    )


@register(
    "llm_feature_hashing_vector",
    oracle=f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), t -> t <> '')
                   AS toks
        FROM documents
    ),
    c AS (
        SELECT doc_id, len(toks) AS n_tokens,
               {", ".join(f"CAST({_fh_bucket_sql(k)} AS BIGINT) AS c{k}" for k in range(16))}
        FROM tk
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST({" + ".join(f"CASE WHEN c{k} > 0 THEN 1 ELSE 0 END" for k in range(16))}
                AS BIGINT) AS nnz,
           CAST({" + ".join(f"c{k} * c{k}" for k in range(16))} AS BIGINT)
               AS l2sq,
           concat_ws(',',
               {", ".join(f"CASE WHEN c{k} > 0 THEN concat('{k}:', CAST(c{k} AS VARCHAR)) END" for k in range(16))}
           ) AS vec
    FROM c
    ORDER BY doc_id
    """,
)
def llm_feature_hashing_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words (Weinberger et al. 2009): each token
    is hashed into one of 16 buckets (md5 prefix — the repo's
    cross-engine-stable hash idiom) and per-document bucket counts form
    a fixed-width sparse feature vector, serialized as ``k:count``
    pairs plus nnz and ‖v‖² — the classic unbounded-vocabulary →
    fixed-dimension featurizer for corpus-scale classifiers and
    quality models.

    Plan shape: ZERO shuffles for the featurization — tokenize, bucket,
    and all 16 counts are higher-order array functions evaluated in the
    scan stage (16 ``filter``+``size`` expressions over the token
    array, one pass each over an in-memory array — no explode, no
    groupBy, no per-row Python). The only exchange is the presentation
    sort. At 100 TB: map-only, embarrassingly parallel, output width
    fixed regardless of vocabulary growth — the property that makes
    feature hashing the scalable choice over a learned vocabulary.

    Exactness: token sets, md5 bucketing, and integer counts are
    identical cross-engine; the serialized string avoids the driver
    canonicalizer's nested-array limitation (G7)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda t: t != ""
    )
    d = docs.select("doc_id", toks.alias("toks"))

    def bucket_count(k: int):
        return F.size(
            F.filter(
                F.col("toks"),
                lambda t: (
                    F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int")
                    % 16
                )
                == F.lit(k),
            )
        ).cast("bigint")

    c = d.select(
        "doc_id",
        F.size(F.col("toks")).cast("bigint").alias("n_tokens"),
        *[bucket_count(k).alias(f"c{k}") for k in range(16)],
    )
    nnz = sum(
        [
            F.when(F.col(f"c{k}") > 0, 1).otherwise(0)
            for k in range(16)
        ],
        F.lit(0),
    ).cast("bigint")
    l2sq = sum(
        [F.col(f"c{k}") * F.col(f"c{k}") for k in range(16)], F.lit(0)
    ).cast("bigint")
    vec = F.concat_ws(
        ",",
        *[
            F.when(
                F.col(f"c{k}") > 0,
                F.concat(
                    F.lit(f"{k}:"), F.col(f"c{k}").cast("string")
                ),
            )
            for k in range(16)
        ],
    )
    return c.select(
        "doc_id",
        "n_tokens",
        nnz.alias("nnz"),
        l2sq.alias("l2sq"),
        vec.alias("vec"),
    ).orderBy("doc_id")
