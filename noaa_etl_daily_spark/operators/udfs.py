"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

Each query implements a computation through the Python boundary AND has a
pure-SQL DuckDB oracle of the same computation — so the oracle check
proves both the Arrow plumbing and the UDF logic.

Performance doctrine (SURVEY §4.2, pyspark guide):

- Row-at-a-time Python UDFs are the slow path — ``udf_python_scalar``
  exists to prove API parity, with the same logic available as a pure
  built-in expression.
- ``pandas_udf`` (scalar and grouped-agg) crosses the JVM↔Python boundary
  in Arrow record batches: ~10-100× less overhead; this is the sanctioned
  pattern when built-ins genuinely can't express the logic.
- ``mapInPandas`` is the UDTF shape (1→N rows per input batch); batch
  size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``,
  so memory stays bounded at any scale.
- All four parallelize per-partition with no extra shuffle beyond what
  the surrounding plan (groupBy) already requires.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..registry import register
from ..tables import load


@register(
    "udf_python_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / 10.0 - 273.15, 4) AS converted
    FROM lineitem
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (GHCN-style tenths→degrees conversion
    shape). Deliberately the slow path — kept tiny and proven equal to
    the SQL twin; real pipelines use the pandas_udf below."""

    def convert(x: float) -> float:
        return x / 10.0 - 273.15

    conv = F.udf(convert, DoubleType())
    li = load(spark, sf_dir, "lineitem")
    # Round OUTSIDE the UDF (Python round() is half-to-even), and at a
    # precision where the decimal intent fits exactly (price has 2dp, /10
    # gives 3dp, so 4dp is never a half-boundary): Spark rounds the exact
    # binary double while DuckDB rounds the shortest decimal repr, and the
    # two disagree ON boundaries (SURVEY §7.4 G2).
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(conv(F.col("l_extendedprice")), 4).alias("converted"),
    )


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
               AS charge
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf (Series→Series): the whole
    partition crosses the boundary as Arrow batches and the arithmetic
    runs vectorized in numpy — the correct shape for custom Python math
    at scale."""

    @pandas_udf(DoubleType())
    def charge(
        price: pd.Series, disc: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = load(spark, sf_dir, "lineitem")
    # Round at the expression level, to 6dp: 2dp price x 2dp rate x 2dp
    # rate has <=6 decimal digits of intent, so neither engine ever sees
    # a half-boundary (their boundary semantics differ — SURVEY §7.4 G2).
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge("l_extendedprice", "l_discount", "l_tax"), 6).alias(
            "charge"
        ),
    )


@register(
    "udaf_pandas_grouped",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a GROUPED_AGG pandas_udf: quantity-weighted
    mean price per (returnflag, linestatus). Each group's columns arrive
    as whole pandas Series; Spark still hash-partitions groups across
    executors, so the aggregation scales exactly like a built-in one
    (minus map-side partial combine — the one cost of custom UDAFs worth
    knowing about at 100 TB)."""

    @pandas_udf(DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias(
            "weighted_avg_price"
        )
    )


@register(
    "udtf_map_in_pandas",
    oracle="""
    SELECT doc_id, token,
           CAST(pos AS INTEGER) AS pos
    FROM (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS token,
             unnest(generate_series(1,
                 len(list_filter(string_split(lower(text), ' '),
                                 t -> t <> '')))) AS pos
      FROM documents
    )
    """,
)
def udtf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped 1→N expansion via mapInPandas: tokenize each document
    into (doc_id, token, pos) rows inside Python, Arrow-batched. The
    same result as explode(split(...)) — which is the point: the oracle
    proves the Python expansion path produces exactly what the built-in
    would, so custom expansions (parsers, samplers, frame extractors)
    can trust the plumbing."""

    def tokenize(batches):
        for pdf in batches:
            toks = pdf["text"].str.lower().str.split(" ")
            out = pdf[["doc_id"]].copy()
            out["token"] = toks
            out = out.explode("token", ignore_index=True)
            out = out[out["token"] != ""].copy()
            out["pos"] = out.groupby("doc_id").cumcount() + 1
            out["pos"] = out["pos"].astype("int32")
            yield out

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(tokenize, "doc_id long, token string, pos int")
