"""Sort / limit / top-k operators (SURVEY.md §2.6).

Scale notes: a global ORDER BY is a range-partitioned shuffle (Spark
samples key ranges first); ORDER BY + LIMIT k never globally sorts — the
planner emits TakeOrderedAndProject (per-partition top-k heaps merged on
the driver), which is the only sane global top-k at 100 TB. Every sort
carries a unique tiebreaker (SURVEY §7.4 G3) so results are deterministic
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "sort_multikey",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey,
           nullif(round(s_acctbal, 0), 0.0) AS bal_bucket
    FROM supplier
    ORDER BY bal_bucket DESC NULLS LAST, s_nationkey ASC, s_suppkey ASC
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort with explicit null placement (nulls are
    manufactured via nullif since fixtures have none). The driver hash is
    order-insensitive, so the check validates the projection + null
    semantics; the sort itself is exercised for plan coverage."""
    supplier = load(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.nullif(F.round("s_acctbal", 0), F.lit(0.0)).alias("bal_bucket"),
    ).orderBy(
        F.col("bal_bucket").desc_nulls_last(),
        F.col("s_nationkey").asc(),
        F.col("s_suppkey").asc(),
    )


@register(
    "topk_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject
    (per-partition heaps, no global sort). o_orderkey tiebreak makes the
    k-th row unique so both engines return the identical set."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )
