"""Set operations (SURVEY.md §2.7).

Spark maps set ops to joins/aggregations under the hood (INTERSECT →
left-semi on distinct, EXCEPT ALL → counted anti). ``unionByName`` is used
everywhere instead of positional ``union`` — positional unions are a
silent-corruption hazard when schemas drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


def _cust_keys(spark, sf_dir, status):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS entity_key, c_acctbal AS balance, 'customer' AS kind
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT s_suppkey AS entity_key, s_acctbal AS balance, 'supplier' AS kind
    FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two differently-shaped inputs normalized to one
    schema — unionByName, so column order can never silently swap."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    c = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_acctbal").alias("balance"),
        F.lit("customer").alias("kind"),
    )
    s = supplier.select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_acctbal").alias("balance"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: nation keys present among customers or suppliers."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersect: customers with both finished and open orders."""
    return _cust_keys(spark, sf_dir, "F").intersect(_cust_keys(spark, sf_dir, "O"))


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersect: multiplicity = min(count_F, count_O) per key."""
    return _cust_keys(spark, sf_dir, "F").intersectAll(_cust_keys(spark, sf_dir, "O"))


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers with finished but no pending orders."""
    return _cust_keys(spark, sf_dir, "F").subtract(_cust_keys(spark, sf_dir, "P"))


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference: multiplicity = max(0, count_F - count_P) per key."""
    return _cust_keys(spark, sf_dir, "F").exceptAll(_cust_keys(spark, sf_dir, "P"))


@register(
    "dedup_exact",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on all selected columns via dropDuplicates — safe and
    deterministic because every output column is a dedup key (keeping
    non-key columns would be order-nondeterministic; that variant is the
    win_row_number keep-first pattern, see llm_dedup_exact_text)."""
    customer = load(spark, sf_dir, "customer")
    return customer.select("c_mktsegment", "c_nationkey").dropDuplicates()
