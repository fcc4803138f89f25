"""Aggregation operators (SURVEY.md §2.4).

Spark-first design: every aggregate here is a plain ``groupBy().agg()`` on
built-in JVM functions, so Catalyst plans partial (map-side) + final
aggregation automatically and whole-stage codegen fuses scan→filter→agg.
At 100 TB the only shuffle is the final per-group exchange of partial
aggregate buffers — already minimal.

Cross-engine determinism (SURVEY.md §7.4 G2): floating aggregates are
wrapped in ``round(...)`` IDENTICALLY on the Spark and DuckDB sides, since
double summation order differs between engines. DuckDB's SUM(int) returns
HUGEINT, so integer sums are cast to BIGINT in the oracle SQL to match
Spark's bigint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

# The flagship: TPC-H Q1-shaped pricing summary (SURVEY.md §7.2).
# Scan → pushed filter → hash-agg (partial+final) → sort, all codegen'd.
Q1_CUTOFF = "1998-09-02 00:00:00"


@register(
    "agg_groupby_multi",
    oracle=f"""
    SELECT
        l_returnflag,
        l_linestatus,
        round(sum(l_quantity), 2)                         AS sum_qty,
        round(sum(l_extendedprice), 2)                    AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                          AS sum_charge,
        round(avg(l_quantity), 6)                         AS avg_qty,
        round(avg(l_extendedprice), 6)                    AS avg_price,
        round(avg(l_discount), 6)                         AS avg_disc,
        count(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key multi-measure hash aggregation (the daily-rollup core of a
    NOAA-style ETL: per-group min/max/mean/sum). TPC-H Q1 shape."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_global",
    oracle="""
    SELECT
        CAST(count(*) AS BIGINT)              AS n_rows,
        round(sum(l_quantity), 2)             AS total_qty,
        round(sum(l_extendedprice), 2)        AS total_price,
        round(avg(l_discount), 6)             AS mean_discount,
        CAST(min(l_quantity) AS DOUBLE)       AS min_qty,
        CAST(max(l_quantity) AS DOUBLE)       AS max_qty,
        min(l_shipdate)                       AS first_ship,
        max(l_shipdate)                       AS last_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped global aggregate — one partial buffer per partition, one
    tiny final reduce; no data shuffle beyond the buffers."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.round(F.avg("l_discount"), 6).alias("mean_discount"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )
