"""Projection, filter, and predicate operators (SURVEY.md §2.2).

All predicates are built from raw columns with built-in functions so they
remain Catalyst-pushable into the parquet scan (``PushedFilters`` in
``.explain``) — the single biggest lever at 100 TB, where a pushed filter
skips row groups via min/max statistics instead of reading them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "project_compute",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 2.0 + 1.0 AS scaled_qty
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns. No rounding needed: both engines
    evaluate the identical IEEE-754 expression per row, so results are
    bit-exact (rounding only matters for order-sensitive aggregation)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") * 2.0 + 1.0).alias("scaled_qty"),
    )


@register(
    "filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30 AND l_returnflag IN ('A', 'R'))
       OR NOT (l_discount BETWEEN 0.02 AND 0.08)
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: AND / OR / NOT / IN / BETWEEN — all of which
    Catalyst pushes into the parquet reader as row-group filters."""
    li = load(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_quantity") > 30) & F.col("l_returnflag").isin("A", "R")
    ) | ~F.col("l_discount").between(0.02, 0.08)
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@register(
    "filter_null_semantics",
    oracle="""
    SELECT o_orderkey, flag
    FROM (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS flag FROM orders)
    WHERE flag IS NULL OR flag IS NOT DISTINCT FROM 'P'
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / null-safe equality. The fixtures contain no nulls, so
    nullif() manufactures them; eqNullSafe is Spark's `IS NOT DISTINCT
    FROM` (three-valued logic: NULL = 'P' is UNKNOWN and would be dropped
    by a plain equality filter)."""
    orders = load(spark, sf_dir, "orders")
    flagged = orders.select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("flag")
    )
    return flagged.filter(F.col("flag").isNull() | F.col("flag").eqNullSafe("P"))


@register(
    "filter_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_type LIKE 'ECON%'
       OR (regexp_matches(p_name, '^(red|blue) (bolt|widget)$') AND p_brand LIKE 'Brand#1_')
    """,
)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regex filtering (the GHCN quality-flag drop pattern:
    keep rows whose flag matches a pattern). Regex kept to the
    dialect-common subset (anchors, alternation, literal classes) so
    Spark's Java regex and DuckDB's RE2 agree."""
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("ECON%")
        | (
            F.col("p_name").rlike("^(red|blue) (bolt|widget)$")
            & F.col("p_brand").like("Brand#1_")
        )
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "validate_expectations",
    oracle="""
    SELECT 'qty_in_range'        AS rule,
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           CAST(count(*) AS BIGINT) AS n_checked
    FROM lineitem
    UNION ALL
    SELECT 'discount_in_range',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'price_positive',
           CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'ship_after_order',
           CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'flag_in_domain',
           CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    """,
)
def validate_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations census (the Great-Expectations / NOAA
    QC-flag pattern): a battery of declarative rules — range, domain,
    sign, cross-table ordering — evaluated as conditional aggregates,
    reported one row per rule.

    Scale shape: the four single-table rules ride ONE scan of lineitem
    (each rule is a sum(CASE) branch in the same partial+final
    aggregate — adding a rule adds a codegen branch, not a pass); the
    cross-table rule (shipped-before-ordered) is the only join, on the
    orderkey equi-key. At 100 TB this is the nightly contract check
    that costs one read of the data regardless of how many
    expectations it enforces."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )

    def rule(name, viol):
        return F.struct(
            F.lit(name).alias("rule"),
            F.sum(F.when(viol, 1).otherwise(0)).alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )

    single = li.agg(
        F.array(
            rule(
                "qty_in_range",
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            ),
            rule(
                "discount_in_range",
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
            ),
            rule("price_positive", F.col("l_extendedprice") <= 0),
            rule(
                "flag_in_domain",
                ~F.col("l_returnflag").isin("A", "N", "R"),
            ),
        ).alias("rules")
    ).select(F.explode("rules").alias("r"))
    cross = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            rule(
                "ship_after_order", F.col("l_shipdate") < F.col("o_orderdate")
            ).alias("r")
        )
        .select("r")
    )
    out = single.unionByName(cross).select("r.rule", "r.n_violations", "r.n_checked")
    return out
