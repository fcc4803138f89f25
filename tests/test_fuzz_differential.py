"""Hypothesis-driven differential fuzzing: random tiny relations pushed
through the same logical query in Spark and DuckDB must agree exactly.

This complements the fixture-based oracle suite with adversarial inputs
the fixtures never produce — NULL keys, empty groups, duplicate rows,
empty inputs — over the core relational semantics (grouping, joins,
distinct, windows). Integer/string domains only: float aggregation
order is covered by the rounding discipline in the main suite, not
re-fuzzed here."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    deadline=None,
    max_examples=10,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

ROW = st.tuples(
    st.one_of(st.none(), st.integers(0, 4)),  # nullable group key
    st.integers(-1000, 1000),  # measure
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # category
)
ROWS = st.lists(ROW, min_size=0, max_size=40)

SCHEMA = "k bigint, v bigint, c string"
PDF_COLS = ["k", "v", "c"]


def _pdf(rows):
    return pd.DataFrame(
        [(k, v, c) for (k, v, c) in rows], columns=PDF_COLS
    ).astype({"k": "Int64", "v": "int64", "c": "object"})


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for row in df.itertuples(index=False):
        out.append(
            tuple(None if pd.isna(x) else x for x in row)
        )
    return sorted(out, key=repr)


def _compare(spark_df, duck_sql, rows, oracle):
    t = _pdf(rows)
    oracle.register("t", t)
    try:
        got = _canon(spark_df.toPandas())
        want = _canon(oracle.execute(duck_sql).df())
    finally:
        oracle.unregister("t")
    assert got == want, f"\nrows={rows}\nspark={got}\nduck ={want}"


@settings(**SETTINGS)
@given(rows=ROWS)
def test_fuzz_groupby_agg(spark, oracle, rows):
    df = spark.createDataFrame([tuple(r) for r in rows], SCHEMA)
    from pyspark.sql import functions as F

    q = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("c").alias("mx"),
        F.count("c").alias("nc"),
    )
    _compare(
        q,
        """SELECT k, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(v) AS BIGINT) AS s,
                  CAST(min(v) AS BIGINT) AS mn,
                  max(c) AS mx,
                  CAST(count(c) AS BIGINT) AS nc
           FROM t GROUP BY k""",
        rows,
        oracle,
    )


@settings(**SETTINGS)
@given(a=ROWS, b=ROWS)
def test_fuzz_joins(spark, oracle, a, b):
    from pyspark.sql import functions as F

    da = spark.createDataFrame([tuple(r) for r in a], SCHEMA)
    db = spark.createDataFrame([tuple(r) for r in b], SCHEMA)
    agg_a = da.groupBy("k").agg(F.sum("v").alias("sa"))
    agg_b = db.groupBy("k").agg(F.sum("v").alias("sb"))
    q = agg_a.join(agg_b, "k", "left").select("k", "sa", "sb")

    # Spark groups NULL keys together but the equi-join is NOT
    # null-safe (a NULL-key group never matches); DuckDB's plain
    # equality join behaves identically, so the oracle mirrors it 1:1.
    t_a, t_b = _pdf(a), _pdf(b)
    oracle.register("ta", t_a)
    oracle.register("tb", t_b)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                """SELECT x.k, CAST(x.sa AS BIGINT) AS sa,
                          CAST(y.sb AS BIGINT) AS sb
                   FROM (SELECT k, sum(v) AS sa FROM ta GROUP BY k) x
                   LEFT JOIN (SELECT k, sum(v) AS sb FROM tb GROUP BY k) y
                     ON x.k = y.k"""
            ).df()
        )
    finally:
        oracle.unregister("ta")
        oracle.unregister("tb")
    assert got == want, f"\na={a}\nb={b}\nspark={got}\nduck ={want}"


@settings(**SETTINGS)
@given(rows=ROWS)
def test_fuzz_distinct_union(spark, oracle, rows):
    df = spark.createDataFrame([tuple(r) for r in rows], SCHEMA)
    q = df.select("k", "c").union(df.select("k", "c")).distinct()
    _compare(
        q,
        """SELECT k, c FROM (
             SELECT k, c FROM t UNION ALL SELECT k, c FROM t
           ) GROUP BY k, c""",
        rows,
        oracle,
    )


@settings(**SETTINGS)
@given(rows=ROWS)
def test_fuzz_window_row_number(spark, oracle, rows):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame([tuple(r) for r in rows], SCHEMA)
    w = Window.partitionBy("k").orderBy("v", "c")
    # keep only deterministic ranks: dedupe ties on the full sort key
    base = df.dropDuplicates(["k", "v", "c"])
    q = base.withColumn("rn", F.row_number().over(w)).select(
        "k", "v", "c", "rn"
    )
    t = _pdf(rows).drop_duplicates(["k", "v", "c"])
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                """SELECT k, v, c,
                          CAST(row_number() OVER (
                              PARTITION BY k
                              ORDER BY v, c NULLS FIRST) AS INTEGER) AS rn
                   FROM t"""
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\nrows={rows}\nspark={got}\nduck ={want}"
