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

from typing import Iterator, Tuple

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
            # notna: a NULL-text doc explodes to one NaN token in
            # pandas, which must vanish like the builtin explode of a
            # NULL array (the oracle's unnest emits no row)
            out = out[out["token"].notna() & (out["token"] != "")].copy()
            out["pos"] = out.groupby("doc_id").cumcount() + 1
            out["pos"] = out["pos"].astype("int32")
            yield out

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(tokenize, "doc_id long, token string, pos int")


@register(
    "udtf_cogrouped_pandas",
    oracle="""
    -- exact integer-cents sums (G2): pandas sums pairwise, the
    -- engines sequentially — a float fold lands on visible 2dp
    -- boundaries once magnitudes mix
    WITH li AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS month,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS DOUBLE) / 100 AS shipped,
             CAST(count(*) AS BIGINT) AS n_ship
      FROM lineitem GROUP BY 1
    ), o AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / 100 AS booked,
             CAST(count(*) AS BIGINT) AS n_book
      FROM orders GROUP BY 1
    )
    SELECT COALESCE(li.month, o.month) AS month,
           COALESCE(shipped, 0.0) AS shipped,
           COALESCE(booked, 0.0) AS booked,
           COALESCE(n_ship, 0) AS n_ship,
           COALESCE(n_book, 0) AS n_book
    FROM li FULL OUTER JOIN o ON li.month = o.month
    """,
)
def udtf_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the two-table custom transform surface:
    lineitem (by ship month) and orders (by order month) arrive as one
    pandas DataFrame PAIR per key, here reduced to a monthly
    book-to-bill report. Spark co-partitions both inputs on the key
    (two shuffles, same as a join would need) and hands each side's
    rows to Python whole — the pattern for custom reconciliation /
    as-of merge logic that neither a join nor a single-table UDAF can
    express. A missing month on either side arrives as an EMPTY pdf
    (the full-outer semantics the oracle mirrors with COALESCE)."""
    import pandas as pd  # noqa: F811 — local for executor pickling

    import numpy as np

    def _cents(series):
        # exact integer cents with round-half-away (matching SQL
        # round(), NOT numpy's half-even): pandas float sums are
        # pairwise-ordered, engine sums sequential — G2
        x = series.to_numpy(dtype="float64") * 100
        return int(
            np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).sum()
        )

    def book_to_bill(key, li_pdf, o_pdf):
        shipped = _cents(
            li_pdf["l_extendedprice"] * (1 - li_pdf["l_discount"])
        )
        return pd.DataFrame(
            [
                {
                    "month": key[0],
                    "shipped": shipped / 100.0,
                    "booked": _cents(o_pdf["o_totalprice"]) / 100.0,
                    "n_ship": len(li_pdf),
                    "n_book": len(o_pdf),
                }
            ]
        )

    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            "l_extendedprice",
            "l_discount",
        )
        .groupBy("month")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_totalprice",
        )
        .groupBy("month")
    )
    return li.cogroup(orders).applyInPandas(
        book_to_bill,
        "month string, shipped double, booked double, n_ship long, n_book long",
    )


@register(
    "udtf_python_native",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
      FROM documents
    )
    SELECT doc_id,
           CAST(c AS INTEGER) AS chunk_idx,
           CAST(CASE WHEN c * 16 <= len(tk) THEN 16
                     ELSE len(tk) - (c - 1) * 16 END AS BIGINT) AS n_tokens,
           tk[(c - 1) * 16 + 1] AS first_token
    FROM (SELECT doc_id, tk,
                 unnest(generate_series(
                     1, CAST(ceil(len(tk) / 16.0) AS BIGINT))) AS c
          FROM toks)
    """,
)
def udtf_python_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 ``@udtf`` class) invoked with a
    correlated LATERAL join — not the mapInPandas approximation: the
    planner sees a proper table function, so each document row fans out
    into its fixed-16-token training chunks (doc_id, chunk_idx,
    n_tokens, first_token) with per-row arguments bound by the lateral.
    The chunking itself is the context-packing primitive every
    pre-training pipeline runs; the oracle replays it with
    generate_series arithmetic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "doc_id bigint, chunk_idx int, n_tokens bigint, first_token string"
    ))
    class ChunkStats:
        def eval(self, doc_id, text):
            toks = [t for t in (text or "").lower().split(" ") if t]
            for i in range(0, len(toks), 16):
                chunk = toks[i : i + 16]
                yield doc_id, i // 16 + 1, len(chunk), chunk[0]

    spark.udtf.register("chunk_stats", ChunkStats)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT s.doc_id, s.chunk_idx, s.n_tokens, s.first_token
        FROM _udtf_docs d, LATERAL chunk_stats(d.doc_id, d.text) s
        """
    )


@register(
    "udtf_map_in_arrow",
    oracle="""
    SELECT l_orderkey,
           CAST(n_lines AS BIGINT) AS n_lines,
           floor((gross_u + 50) / 100.0) / 100.0 AS gross
    FROM (
      SELECT l_orderkey, count(*) AS n_lines,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS gross_u
      FROM lineitem GROUP BY l_orderkey
    )
    """,
)
def udtf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy sibling of mapInPandas: the UDF
    receives raw ``pyarrow.RecordBatch`` objects, skipping the
    Arrow→pandas conversion entirely. The right boundary when the
    Python side is itself Arrow-native (pyarrow.compute, DataFusion,
    Polars, GPU libraries). Here a per-batch pyarrow group_by computes
    order-level partials; a JVM-side groupBy then merges partials
    across batches — the same partial/final split a built-in aggregate
    uses, so the shuffle carries per-order partials, never raw rows.
    The money math is INTEGER (price and discount are 2-decimal, so
    price¢ × (100-disc¢) is an exact unit of 10^-4 dollars): integer
    partial sums are associative-exact, making the parallel merge
    order-independent — float partials would drift a last-ulp per
    merge order and flip a rounding boundary somewhere in 15k groups —
    and the final half-up-to-cents rounding is integer arithmetic too
    ((u+50) div 100), because many orders land EXACTLY on .xx5 where
    Spark's decimal-string round and DuckDB's binary round disagree.
    The oracle is the pure-SQL twin with the same integer arithmetic."""
    import pyarrow as pa

    def per_batch_partials(batches):
        pc = pa.compute
        for batch in batches:
            price_c = pc.cast(
                pc.round(pc.multiply(batch.column("l_extendedprice"), pa.scalar(100.0))),
                pa.int64(),
            )
            disc_c = pc.cast(
                pc.round(pc.multiply(batch.column("l_discount"), pa.scalar(100.0))),
                pa.int64(),
            )
            tbl = pa.table(
                {
                    "l_orderkey": batch.column("l_orderkey"),
                    "gross_u": pc.multiply(
                        price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c)
                    ),
                }
            )
            agg = tbl.group_by("l_orderkey").aggregate(
                [("gross_u", "sum"), ("gross_u", "count")]
            )
            agg = agg.rename_columns(["l_orderkey", "gross_u", "n_part"])
            for out in agg.to_batches():
                yield out

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    partials = li.mapInArrow(
        per_batch_partials, "l_orderkey long, gross_u long, n_part long"
    )
    return partials.groupBy("l_orderkey").agg(
        F.sum("n_part").alias("n_lines"),
        (F.floor((F.sum("gross_u") + 50) / 100) / 100.0).alias("gross"),
    )


@register(
    "udf_pandas_iter",
    oracle="""
    SELECT event_id, event_type,
           round(value * CASE event_type
                 WHEN 'view' THEN 0.1 WHEN 'click' THEN 0.5
                 WHEN 'purchase' THEN 2.0 ELSE 1.0 END, 4) AS score
    FROM events
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (SCALAR_ITER eval type) — the
    batch-inference shape: expensive per-worker setup (model load,
    tokenizer init) runs ONCE per partition before the batch loop,
    then every Arrow batch reuses it. A plain Series→Series UDF
    re-enters Python per batch with no place to hoist setup; at 100 TB
    with a real model that difference is the whole inference bill.
    Here the "model" is a deterministic weight table so the oracle is
    an exact CASE expression."""
    @pandas_udf(DoubleType())
    def score(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # once-per-partition "model load"
        model = {"view": 0.1, "click": 0.5, "purchase": 2.0}
        for value, etype in batches:
            yield value * etype.map(model).fillna(1.0)

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.round(score("value", "event_type"), 4).alias("score"),
    )


@register(
    "udf_arrow_optimized",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'low' END || ':' || o_orderpriority AS bucket_tag
    FROM orders
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``@udf(..., useArrow=True)``, Spark
    3.5+/4): row-wise Python logic but Arrow-batched transport — the
    middle rung between the legacy pickled UDF (slowest) and a
    vectorized pandas_udf (fastest). The right tool when per-row
    Python is genuinely branchy and a Series-vectorized rewrite is
    awkward; the oracle is the pure-SQL CASE twin proving the Arrow
    path is semantics-preserving."""
    from pyspark.sql.functions import udf

    @udf("string", useArrow=True)
    def tag(price: float, prio: str) -> str:
        # NULL-strict like the oracle's || (and any builtin concat):
        # a None would otherwise render as the literal "low:None" —
        # Python UDFs receive None, they don't propagate it (G11)
        if price is None or prio is None:
            return None
        if price >= 200000:
            band = "high"
        elif price >= 50000:
            band = "mid"
        else:
            band = "low"
        return f"{band}:{prio}"

    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", tag("o_totalprice", "o_orderpriority").alias("bucket_tag")
    )


@register(
    "udtf_table_argument",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 UDTF with a TABLE argument + PARTITION BY — the
    'whole-relation in, relation out' Python boundary: each UDTF
    instance receives ONE priority partition's rows through eval() and
    emits its summary from terminate(). This is the SQL-native sibling
    of udaf_pandas_grouped (applyInPandas): the planner shuffles on
    the PARTITION BY key exactly as for a groupBy, Python holds only
    per-partition running state (three scalars here — O(1) memory
    regardless of partition size), and the oracle is the plain SQL
    aggregate the UDTF must reproduce. Integer-cent accumulation keeps
    the Python-side fold order-independent (G2)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "o_orderpriority string, n_orders bigint, "
        "total_cents bigint, max_key bigint"
    ))
    class PriorityStats:
        def __init__(self):
            self.pri = None
            self.n = 0
            self.cents = 0
            self.max_key = None

        def eval(self, row):
            self.pri = row["o_orderpriority"]
            self.n += 1
            self.cents += int(round(row["o_totalprice"] * 100))
            k = row["o_orderkey"]
            self.max_key = k if self.max_key is None else max(self.max_key, k)

        def terminate(self):
            if self.n:
                yield self.pri, self.n, self.cents, self.max_key

    spark.udtf.register("priority_stats_udtf", PriorityStats)
    load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).createOrReplaceTempView("_udtf_orders")
    return spark.sql(
        """
        SELECT * FROM priority_stats_udtf(
          TABLE(_udtf_orders) PARTITION BY o_orderpriority
        )
        """
    )
