"""Table loaders for the driver-supplied parquet fixtures (FIXTURES.md).

Every query builder loads through :func:`load` so per-table quirks are
handled exactly once:

- ``events.ts`` is parquet TIMESTAMP(NANOS). With
  ``spark.sql.legacy.parquet.nanosAsLong=true`` it reads as bigint
  nanoseconds; we convert with integer division (``ts div 1000`` →
  ``timestamp_micros``) which truncates exactly like DuckDB's ns→µs read,
  then cast to TIMESTAMP_NTZ so all fixture timestamps share one type
  (l_shipdate / o_orderdate already read as timestamp_ntz).

At 100 TB these loaders are where partition-pruned, column-pruned scans
originate: they return plain ``spark.read.parquet`` DataFrames (no eager
caching, no collect), so Catalyst pushes filters and prunes columns into
the scan of whatever query is built on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def path_for(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table, normalizing schema quirks."""
    configure_session(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(path_for(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.parquet(path_for(sf_dir, "events"))
    ts_type = raw.schema["ts"].dataType.typeName()
    if ts_type == "long":
        # Fixture written as parquet TIMESTAMP(NANOS): with
        # spark.sql.legacy.parquet.nanosAsLong=true it reads as bigint
        # nanoseconds. ns → µs by FLOOR division (DuckDB's ns→µs read
        # floors; Spark's `div` truncates toward zero, which differs by
        # 1µs for pre-epoch negative timestamps — the correction term
        # makes it floor for all inputs). Integer arithmetic throughout:
        # double division of ~1.7e18 ns would lose precision past the
        # 53-bit mantissa.
        return raw.withColumn(
            "ts",
            F.expr(
                "cast(timestamp_micros(ts div 1000 - cast(ts % 1000 < 0 as int)) "
                "as timestamp_ntz)"
            ),
        )
    if ts_type == "timestamp":
        # Instant-typed read (session tz pinned to UTC) — normalize to
        # NTZ so every fixture timestamp shares one type.
        return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    # timestamp_ntz already (parquet TIMESTAMP(MICROS, not-UTC-adjusted),
    # the current driver fixtures) — nothing to normalize.
    return raw


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}
