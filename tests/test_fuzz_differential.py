"""Hypothesis-driven differential fuzzing: random tiny relations pushed
through the same logical query in Spark and DuckDB must agree exactly.

This complements the fixture-based oracle suite with adversarial inputs
the fixtures never produce — NULL keys, empty groups, duplicate rows,
empty inputs — over the core relational semantics (grouping, joins,
distinct, windows, set ops), plus the repo's cross-engine DISCIPLINES
fuzzed on their safe domains and every known boundary DIVERGENCE
pinned as an executable `test_known_*` (SURVEY §7.4 G4b/G4c, G9, G13,
G14, G15): unicode case-fold, JSON extraction, the regexp pattern
class, tokenization, calendar bucketing, null-aware NOT IN,
ntile/percent_rank, decimal HALF_UP rounding, try_cast grammar, null
ordering under LIMIT, month-end clamping, integer-division pairings,
NaN/Inf extrema, sum-overflow widening, the seeded-hash ladder, and
string-function edges. Raw float aggregation order is deliberately
absent: the G2 quantization discipline forbids it in oracled outputs,
and the main suite pins that discipline instead."""

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


@settings(**SETTINGS)
@given(rows=ROWS)
def test_fuzz_window_frames_running_and_sliding(spark, oracle, rows):
    """Running and 3-row sliding frames over adversarial inputs (NULL
    keys, duplicate values, empty partitions). Ordering is made unique
    with an explicit row id so frame contents are deterministic on
    both engines."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    indexed = [(i, *r) for i, r in enumerate(rows)]
    df = spark.createDataFrame(indexed, "rid bigint, " + SCHEMA)
    w = Window.partitionBy("k").orderBy("rid")
    q = df.select(
        "rid",
        "k",
        "v",
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "run_sum"
        ),
        F.sum("v").over(w.rowsBetween(-2, 0)).alias("slide_sum"),
        F.lag("v", 1).over(w).alias("prev_v"),
        F.count("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "run_nc"
        ),
    )
    t = pd.DataFrame(indexed, columns=["rid", *PDF_COLS]).astype(
        {"rid": "int64", "k": "Int64", "v": "int64", "c": "object"}
    )
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                """SELECT rid, k, v,
                          CAST(sum(v) OVER (PARTITION BY k ORDER BY rid
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
                              AS run_sum,
                          CAST(sum(v) OVER (PARTITION BY k ORDER BY rid
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                               AS BIGINT) AS slide_sum,
                          CAST(lag(v, 1) OVER (PARTITION BY k ORDER BY rid)
                               AS BIGINT) AS prev_v,
                          CAST(count(c) OVER (PARTITION BY k ORDER BY rid
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
                              AS run_nc
                   FROM t"""
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\nrows={rows}\nspark={got}\nduck ={want}"


@settings(**SETTINGS)
@given(a=ROWS, b=ROWS)
def test_fuzz_bag_setops(spark, oracle, a, b):
    """INTERSECT ALL / EXCEPT ALL multiplicity semantics under
    duplicates and NULLs — bag semantics are where set-op
    implementations actually diverge (count-min of multiplicities for
    intersect, saturating difference for except; NULLs compare equal
    in both engines' set ops)."""
    da = spark.createDataFrame([tuple(r) for r in a], SCHEMA).select("k", "c")
    db = spark.createDataFrame([tuple(r) for r in b], SCHEMA).select("k", "c")
    qi = da.intersectAll(db)
    qe = da.exceptAll(db)
    ta, tb = _pdf(a)[["k", "c"]], _pdf(b)[["k", "c"]]
    oracle.register("ta", ta)
    oracle.register("tb", tb)
    try:
        got_i = _canon(qi.toPandas())
        got_e = _canon(qe.toPandas())
        want_i = _canon(
            oracle.execute(
                "SELECT k, c FROM ta INTERSECT ALL SELECT k, c FROM tb"
            ).df()
        )
        want_e = _canon(
            oracle.execute(
                "SELECT k, c FROM ta EXCEPT ALL SELECT k, c FROM tb"
            ).df()
        )
    finally:
        oracle.unregister("ta")
        oracle.unregister("tb")
    assert got_i == want_i, f"\na={a}\nb={b}\nspark={got_i}\nduck ={want_i}"
    assert got_e == want_e, f"\na={a}\nb={b}\nspark={got_e}\nduck ={want_e}"


@given(rows=ROWS)
@settings(**SETTINGS)
def test_fuzz_max_by_struct_equals_window_top1(spark, oracle, rows):
    """sql_distinct_on's core claim, fuzzed: max_by over a struct
    (measure, -id) tie-break key must pick EXACTLY the row that
    row_number()=1 ordered by (measure DESC, id ASC) picks — for
    duplicate measures, NULL group keys, and single-row groups alike.
    The window form is the DuckDB oracle (its DISTINCT ON desugars the
    same way)."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(_pdf(rows), schema=SCHEMA)
    # v is the measure; rid = a unique-ish surrogate built from (v, c)
    # would be ambiguous, so use monotonically unique row ids instead:
    # fuzz rows carry no unique id, so dedupe exact duplicates first —
    # both engines then agree on a unique winner per group.
    sdf = sdf.dropDuplicates(["k", "v", "c"])
    key = F.struct(F.col("v").alias("m"), F.col("c").alias("tb"))
    got_df = sdf.groupBy("k").agg(
        F.max_by("c", key).alias("c_pick"), F.max("v").alias("v_max")
    )
    _compare(
        got_df,
        """
        SELECT k, c AS c_pick, v AS v_max FROM (
          SELECT *, row_number() OVER (
            PARTITION BY k ORDER BY v DESC, c DESC NULLS LAST
          ) AS rn
          FROM (SELECT DISTINCT k, v, c FROM t)
        ) WHERE rn = 1
        """,
        rows,
        oracle,
    )


LEFT_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=25
)
RIGHT_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(-99, 99)),
    min_size=0,
    max_size=25,
)


@given(left=LEFT_ROWS, right=RIGHT_ROWS)
@settings(**SETTINGS)
def test_fuzz_union_window_asof_equals_native_asof(spark, oracle, left, right):
    """The engine's as-of join technique (union both sides + per-key
    ordered window carrying the last quote forward — joins.py
    join_asof), fuzzed against DuckDB's NATIVE ASOF JOIN on adversarial
    cases the fixtures never hit: empty sides, keys with no quotes,
    exact timestamp ties (>= must match), and quote-before-everything
    rows. Right side is deduped to unique (k, t) so both engines have
    a deterministic winner."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    lpdf = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "t", "lid"]
    ).astype("int64")
    rpdf = (
        pd.DataFrame(right, columns=["k", "t", "val"])
        .astype("int64")
        .groupby(["k", "t"], as_index=False)["val"]
        .max()
    )
    ldf = spark.createDataFrame(lpdf, "k long, t long, lid long")
    rdf = spark.createDataFrame(rpdf, "k long, t long, val long")

    # union + window: right rows (src=0) sort before left (src=1) at the
    # same t, so the running last-non-null implements t_right <= t_left
    tagged = rdf.select(
        "k", "t", F.lit(0).alias("src"), F.lit(None).cast("long").alias("lid"), "val"
    ).unionByName(
        ldf.select(
            "k", "t", F.lit(1).alias("src"), "lid", F.lit(None).cast("long").alias("val")
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got_df = (
        tagged.withColumn("asof_val", F.last("val", ignorenulls=True).over(w))
        .filter(F.col("src") == 1)
        .select("k", "t", "lid", "asof_val")
    )

    oracle.register("lt", lpdf)
    oracle.register("rt", rpdf)
    try:
        got = _canon(got_df.toPandas())
        want = _canon(
            oracle.execute(
                """
                SELECT l.k, l.t, l.lid, r.val AS asof_val
                FROM lt l ASOF LEFT JOIN rt r
                  ON l.k = r.k AND l.t >= r.t
                """
            ).df()
        )
    finally:
        oracle.unregister("lt")
        oracle.unregister("rt")
    assert got == want


SESSION_ROWS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 60)), min_size=1, max_size=30
)


@given(rows=SESSION_ROWS)
@settings(**SETTINGS)
def test_fuzz_session_window_boundary_semantics(spark, oracle, rows):
    """Native session_window vs the gaps-and-islands desugaring, fuzzed
    over integer-second timestamps dense enough to hit the EXACT-gap
    boundary constantly. Documents an empirically-established boundary
    semantic: an event arriving exactly gap seconds after the previous
    one EXTENDS the session (touching windows merge), so the correct
    desugaring splits on STRICTLY greater — the first draft of this
    test used >= and hypothesis immediately produced the
    counterexample, which is why the engine's session oracles use >."""
    import pandas as pd
    from pyspark.sql import functions as F

    gap = 10
    pdf = pd.DataFrame(rows, columns=["k", "s"]).drop_duplicates().astype("int64")
    sdf = spark.createDataFrame(pdf, "k long, s long").withColumn(
        "ts", F.to_timestamp(F.col("s"))
    )
    got_df = (
        sdf.groupBy("k", F.session_window("ts", f"{gap} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "k",
            F.unix_timestamp("w.start").alias("s_start"),
            F.unix_timestamp("w.end").alias("s_end"),
            "n",
        )
    )
    oracle.register("t_sess", pdf)
    try:
        got = _canon(got_df.toPandas())
        want = _canon(
            oracle.execute(
                f"""
                WITH flagged AS (
                  SELECT k, s,
                         CASE WHEN lag(s) OVER (PARTITION BY k ORDER BY s)
                                   IS NULL
                              OR s - lag(s) OVER (PARTITION BY k ORDER BY s)
                                   > {gap}
                              THEN 1 ELSE 0 END AS new_s
                  FROM t_sess
                ), numbered AS (
                  SELECT *, sum(new_s) OVER (PARTITION BY k ORDER BY s
                             ROWS UNBOUNDED PRECEDING) AS sid
                  FROM flagged
                )
                SELECT k, min(s) AS s_start, max(s) + {gap} AS s_end,
                       CAST(count(*) AS BIGINT) AS n
                FROM numbered GROUP BY k, sid
                """
            ).df()
        )
    finally:
        oracle.unregister("t_sess")
    assert got == want


@given(rows=ROWS)
@settings(**SETTINGS)
def test_fuzz_rollup_grouping_nulls(spark, oracle, rows):
    """ROLLUP under NULLABLE group keys — the classic trap where a DATA
    NULL group is indistinguishable from the subtotal row unless
    GROUPING() disambiguates. The fixture-based rollup oracle never
    exercises NULL keys; this fuzz does, asserting Spark's rollup +
    grouping() flags agree with DuckDB's for every (k, c) combination
    including the all-NULL input.

    Documented divergence (found by this fuzz): on EMPTY input the SQL
    standard (and DuckDB) still emits the grand-total grouping set —
    one row with count 0 — while Spark's Expand-based rollup emits
    nothing. The empty branch asserts exactly that difference so a
    behavior change in either engine trips the test."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(_pdf(rows), schema=SCHEMA)
    got_df = sdf.rollup("k", "c").agg(
        F.grouping("k").cast("long").alias("gk"),
        F.grouping("c").cast("long").alias("gc"),
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
    )
    duck_sql = """
        SELECT k, c,
               CAST(GROUPING(k) AS BIGINT) AS gk,
               CAST(GROUPING(c) AS BIGINT) AS gc,
               CAST(count(*) AS BIGINT) AS n,
               sum(v) AS sv
        FROM t GROUP BY ROLLUP (k, c)
        """
    if not rows:
        t = _pdf(rows)
        oracle.register("t", t)
        try:
            got = _canon(got_df.toPandas())
            want = _canon(oracle.execute(duck_sql).df())
        finally:
            oracle.unregister("t")
        assert got == []
        assert want == [(None, 1, 1, None, 0, None)]
        return
    _compare(got_df, duck_sql, rows, oracle)


@given(rows=ROWS)
@settings(**SETTINGS)
def test_fuzz_median_interpolation(spark, oracle, rows):
    """Exact interpolated median over integers: Spark percentile(0.5)
    and DuckDB quantile_cont(0.5) both linear-interpolate, and for the
    0.5 quantile of integers the interpolation (a+b)/2 is IEEE-exact —
    so the engines must agree bit-for-bit on adversarial group shapes
    (singletons, NULL keys, even/odd counts, duplicates). Locks the
    agg_percentile pairing beyond the fixture distribution."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(_pdf(rows), schema=SCHEMA)
    got_df = sdf.groupBy("k").agg(
        F.percentile("v", F.lit(0.5)).alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    _compare(
        got_df,
        """
        SELECT k, quantile_cont(v, 0.5) AS med,
               CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY k
        """,
        rows,
        oracle,
    )


@given(a=ROWS, b=ROWS)
@settings(**SETTINGS)
def test_fuzz_null_safe_join(spark, oracle, a, b):
    """eqNullSafe (<=>) vs IS NOT DISTINCT FROM, fuzzed: NULL keys must
    MATCH each other (unlike the plain equi-join fuzz above where they
    never do), across empty sides, NULL-only sides, and duplicate
    keys. Locks join_null_safe_eq's semantics beyond the fixture."""
    from pyspark.sql import functions as F

    da = spark.createDataFrame(_pdf(a), schema=SCHEMA)
    db = spark.createDataFrame(_pdf(b), schema=SCHEMA)
    agg_a = da.groupBy("k").agg(F.sum("v").alias("sa"))
    agg_b = db.groupBy("k").agg(F.sum("v").alias("sb"))
    q = agg_a.join(agg_b, agg_a.k.eqNullSafe(agg_b.k)).select(
        agg_a.k.alias("k"), "sa", "sb"
    )
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
                   JOIN (SELECT k, sum(v) AS sb FROM tb GROUP BY k) y
                     ON x.k IS NOT DISTINCT FROM y.k"""
            ).df()
        )
    finally:
        oracle.unregister("ta")
        oracle.unregister("tb")
    assert got == want, f"\na={a}\nb={b}\nspark={got}\nduck ={want}"


@given(rows=ROWS)
@settings(**SETTINGS)
def test_fuzz_pivot_case_sum(spark, oracle, rows):
    """The CASE-sum pivot formulation (agg_pivot's plan) fuzzed against
    DuckDB's explicit conditional aggregation under NULL categories and
    NULL keys: a NULL category row must land in NO pivot column while
    still counting toward the group's row total."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(_pdf(rows), schema=SCHEMA)
    got_df = sdf.groupBy("k").agg(
        *[
            F.sum(F.when(F.col("c") == cat, F.col("v"))).alias(f"v_{cat}")
            for cat in ("a", "b", "c")
        ],
        F.count(F.lit(1)).alias("n_rows"),
    )
    _compare(
        got_df,
        """
        SELECT k,
               sum(CASE WHEN c = 'a' THEN v END) AS v_a,
               sum(CASE WHEN c = 'b' THEN v END) AS v_b,
               sum(CASE WHEN c = 'c' THEN v END) AS v_c,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM t GROUP BY k
        """,
        rows,
        oracle,
    )


TEXT = st.text(
    alphabet=st.sampled_from(list(" abZ0é你🙂\t")), min_size=0, max_size=12
)
TEXTS = st.lists(TEXT, min_size=0, max_size=25)


@settings(**SETTINGS)
@given(texts=TEXTS)
def test_fuzz_tokenize_discipline(spark, oracle, texts):
    """The house tokenization (`split(lower(text), ' ')` + drop empty
    strings) fuzzed against DuckDB's `string_split` + `list_filter`
    on adversarial strings — empty, all-spaces, leading/trailing and
    double spaces, tabs-as-content, unicode, emoji. Dozens of llm_*
    oracles assume these two pipelines produce identical token
    multisets; this pins it on inputs the fixture never contains."""
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    toks = F.filter(
        F.split(F.lower(F.col("text")), " ", -1), lambda t: t != ""
    )
    q = df.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.explode(
            F.concat(toks, F.array(F.lit("<END>")))  # keep empty docs
        ).alias("tok"),
    )
    t = pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64", "text": "object"}
    )
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                """
                WITH toks AS (
                  SELECT doc_id,
                         list_append(
                             list_filter(string_split(lower(text), ' '),
                                         x -> x <> ''), '<END>') AS tk,
                         CAST(len(list_filter(string_split(lower(text), ' '),
                                              x -> x <> '')) AS BIGINT)
                             AS n_tokens
                  FROM t
                )
                SELECT doc_id, n_tokens, unnest(tk) AS tok FROM toks
                """
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\ntexts={texts!r}\nspark={got}\nduck ={want}"


EPOCHS = st.lists(
    st.integers(0, 2_000_000_000), min_size=0, max_size=30
)


@settings(**SETTINGS)
@given(epochs=EPOCHS)
def test_fuzz_datetime_bucketing(spark, oracle, epochs):
    """Calendar bucketing conventions fuzzed over arbitrary epochs
    (1970..2033): date_trunc day/week/month, dayofweek (Spark is
    1=Sunday, DuckDB 0=Sunday — the +1 shift every evt_* oracle
    relies on), hour extraction, and the epoch round-trip. Week
    truncation pins the shared Monday convention across month/year
    boundaries and leap days."""
    from pyspark.sql import functions as F

    rows = [(i, e) for i, e in enumerate(epochs)]
    df = spark.createDataFrame(rows, "rid bigint, epoch bigint")
    ts = F.timestamp_seconds(F.col("epoch"))
    q = df.select(
        "rid",
        F.date_trunc("day", ts).alias("d_day"),
        F.date_trunc("week", ts).alias("d_week"),
        F.date_trunc("month", ts).alias("d_month"),
        F.dayofweek(ts).cast("bigint").alias("dow1sun"),
        F.hour(ts).cast("bigint").alias("hh"),
        ts.cast("long").alias("epoch_rt"),
    )
    t = pd.DataFrame(rows, columns=["rid", "epoch"]).astype("int64")
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                """
                WITH ts AS (
                  SELECT rid, make_timestamp(epoch * 1000000) AS x,
                         epoch
                  FROM t
                )
                SELECT rid,
                       date_trunc('day', x) AS d_day,
                       date_trunc('week', x) AS d_week,
                       date_trunc('month', x) AS d_month,
                       CAST(dayofweek(x) + 1 AS BIGINT) AS dow1sun,
                       CAST(hour(x) AS BIGINT) AS hh,
                       CAST(epoch AS BIGINT) AS epoch_rt
                FROM ts
                """
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\nepochs={epochs}\nspark={got}\nduck ={want}"


@settings(**SETTINGS)
@given(a=ROWS, b=ROWS)
def test_fuzz_not_in_null_aware_vs_anti_join(spark, oracle, a, b):
    """NULL-aware NOT IN vs the plain left-anti join, both engines.
    The classic divergence: if the subquery produces ANY NULL key,
    NOT IN returns no rows at all, while left-anti (not-null-equal)
    keeps left rows without a match — and a NULL left key is kept by
    anti but never by NOT IN. Both semantics fuzzed side by side."""
    da = spark.createDataFrame([tuple(r) for r in a], SCHEMA)
    db = spark.createDataFrame([tuple(r) for r in b], SCHEMA)
    da.createOrReplaceTempView("fa")
    db.createOrReplaceTempView("fb")
    not_in = spark.sql(
        "SELECT k, v FROM fa WHERE k NOT IN (SELECT k FROM fb)"
    )
    anti = da.join(db, "k", "left_anti").select("k", "v")

    t_a, t_b = _pdf(a), _pdf(b)
    oracle.register("ta", t_a)
    oracle.register("tb", t_b)
    try:
        got_ni = _canon(not_in.toPandas())
        want_ni = _canon(
            oracle.execute(
                "SELECT k, CAST(v AS BIGINT) AS v FROM ta "
                "WHERE k NOT IN (SELECT k FROM tb)"
            ).df()
        )
        got_aj = _canon(anti.toPandas())
        want_aj = _canon(
            oracle.execute(
                "SELECT k, CAST(v AS BIGINT) AS v FROM ta "
                "WHERE NOT EXISTS (SELECT 1 FROM tb WHERE tb.k = ta.k)"
            ).df()
        )
    finally:
        oracle.unregister("ta")
        oracle.unregister("tb")
    assert got_ni == want_ni, f"\nNOT IN\na={a}\nb={b}\n{got_ni}\n{want_ni}"
    assert got_aj == want_aj, f"\nANTI\na={a}\nb={b}\n{got_aj}\n{want_aj}"


@settings(**SETTINGS)
@given(rows=ROWS)
def test_fuzz_ntile_percent_rank(spark, oracle, rows):
    """ntile(3) bucket boundaries (first buckets take the remainder)
    and percent_rank / cume_dist over deduplicated sort keys, fuzzed
    across partition sizes 0..n including single-row and all-one-group
    shapes — the distributed-rank twins reimplement exactly these
    definitions, so the engine agreement is load-bearing."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    base = spark.createDataFrame(
        [tuple(r) for r in rows], SCHEMA
    ).dropDuplicates(["k", "v"]).select("k", "v")
    w = Window.partitionBy("k").orderBy("v")
    q = base.select(
        "k",
        "v",
        F.ntile(3).over(w).cast("bigint").alias("bucket"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )
    t = _pdf(rows).drop_duplicates(["k", "v"])[["k", "v"]]
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                """
                SELECT k, CAST(v AS BIGINT) AS v,
                       CAST(ntile(3) OVER (PARTITION BY k ORDER BY v)
                            AS BIGINT) AS bucket,
                       round(percent_rank() OVER (
                           PARTITION BY k ORDER BY v), 9) AS pr,
                       round(cume_dist() OVER (
                           PARTITION BY k ORDER BY v), 9) AS cd
                FROM t
                """
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\nrows={rows}\nspark={got}\nduck ={want}"


def test_known_unicode_casefold_divergence(spark, oracle):
    """Executable documentation of the ONE code point where the
    tokenize discipline's `lower()` diverges across engines: U+0130
    (LATIN CAPITAL LETTER I WITH DOT ABOVE). The JVM applies Unicode
    SpecialCasing (→ 'i' + U+0307 combining dot, 2 code points);
    DuckDB's simple case fold gives plain 'i'. Every other probe —
    ß, ǅ, Greek sigma incl. final-position, ligatures — agrees.
    Irrelevant for the synthetic fixtures (no Turkish text); a real
    Turkish corpus must NFKC-normalize (or use ICU collation) before
    any cross-engine lowered comparison. If an engine upgrade changes
    either side, this test fails and the tokenize fuzz alphabet should
    be revisited."""
    from pyspark.sql import functions as F

    agree = ["STRASSE ß", "ǅungla", "ΣΙΓΜΑ τέλος Σ", "ﬃ LIGATURE", "ı"]
    rows = [(i, s) for i, s in enumerate(agree + ["İ"])]
    df = spark.createDataFrame(rows, "i bigint, s string")
    got = {r.i: r.l for r in df.select("i", F.lower("s").alias("l")).collect()}
    for i, s in rows[: len(agree)]:
        want = oracle.execute("SELECT lower(?)", [s]).fetchone()[0]
        assert got[i] == want, (s, got[i], want)
    # the documented divergence
    duck = oracle.execute("SELECT lower('İ')").fetchone()[0]
    assert duck == "i"
    assert got[len(agree)] == "i̇"


import json as _json

JVAL = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-1000, 1000),
        st.text(alphabet=st.sampled_from(list("ab é🙂\\\"")), max_size=6),
    ),
    lambda children: st.dictionaries(
        st.sampled_from(["k", "x", "nested"]), children, max_size=3
    ),
    max_leaves=6,
)
JOBJS = st.lists(
    st.dictionaries(st.sampled_from(["k", "x", "nested"]), JVAL, max_size=3),
    min_size=0,
    max_size=20,
)


@settings(**SETTINGS)
@given(objs=JOBJS)
def test_fuzz_json_extract_discipline(spark, oracle, objs):
    """The props-parsing discipline (`get_json_object(props, '$.k')` on
    the Spark side, `json_extract_string(props, '$.k')` on the oracle
    side) fuzzed over generated JSON objects with missing keys, JSON
    nulls, booleans, negative numbers, unicode/escape-heavy strings,
    and nested objects — the shapes a real `props` column carries.
    Scalar extractions must agree byte-for-byte; rows where the key is
    missing or json-null must be NULL on both engines."""
    from pyspark.sql import functions as F

    rows = [(i, _json.dumps(o)) for i, o in enumerate(objs)]
    df = spark.createDataFrame(rows, "rid bigint, props string")
    q = df.select(
        "rid", F.get_json_object("props", "$.k").alias("kv")
    ).where(
        # nested objects serialize with engine-specific key order and
        # whitespace; the scalar discipline is what the repo relies on
        ~F.get_json_object("props", "$.k").rlike(r"^[\[{]")
        | F.get_json_object("props", "$.k").isNull()
    )
    t = pd.DataFrame(rows, columns=["rid", "props"]).astype(
        {"rid": "int64", "props": "object"}
    )
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                """
                SELECT rid, json_extract_string(props, '$.k') AS kv
                FROM t
                WHERE json_extract_string(props, '$.k') IS NULL
                   OR NOT regexp_matches(
                          json_extract_string(props, '$.k'), '^[\\[{]')
                """
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\nobjs={objs!r}\nspark={got}\nduck ={want}"


URLISH = st.text(
    alphabet=st.sampled_from(list("ab:/?&=.#%é 你")), min_size=0, max_size=30
)


@settings(**SETTINGS)
@given(texts=st.lists(URLISH, min_size=0, max_size=25))
def test_fuzz_regexp_discipline(spark, oracle, texts):
    """The repo's actual regexp patterns (word extraction, devoweling,
    URL host/path/param parsing) fuzzed over adversarial strings —
    empty, no-match, unicode, '%'-escapes, stray separators. Java
    regex (Spark) and RE2 (DuckDB) must agree for this pattern class
    (anchors, char classes, capture groups — no backrefs/lookarounds
    anywhere in the repo, by design)."""
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "rid bigint, s string")
    q = df.select(
        "rid",
        F.regexp_extract("s", r"^([a-z]+) ([a-z]+)", 2).alias("second"),
        F.regexp_replace("s", r"[aeiou]", "*").alias("devowel"),
        F.regexp_extract("s", r"^https?://([^/]+)", 1).alias("host"),
        F.regexp_extract("s", r"id=([^&]*)", 1).alias("id_param"),
    )
    t = pd.DataFrame(rows, columns=["rid", "s"]).astype(
        {"rid": "int64", "s": "object"}
    )
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                r"""
                SELECT rid,
                       regexp_extract(s, '^([a-z]+) ([a-z]+)', 2) AS second,
                       regexp_replace(s, '[aeiou]', '*', 'g') AS devowel,
                       regexp_extract(s, '^https?://([^/]+)', 1) AS host,
                       regexp_extract(s, 'id=([^&]*)', 1) AS id_param
                FROM t
                """
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\ntexts={texts!r}\nspark={got}\nduck ={want}"


def test_known_double_round_representational_divergence(spark, oracle):
    """Executable documentation: `round(DOUBLE, d)` can diverge across
    engines at representational boundaries. Spark routes doubles
    through BigDecimal.valueOf (i.e. rounds the SHORTEST DECIMAL
    STRING of the double, so 1.005 -> "1.005" -> HALF_UP -> 1.01);
    DuckDB rounds the BINARY value (1.005 is really 1.00499999...96,
    so -> 1.0). Neither is wrong — they disagree about what a double
    *is*. This is exactly why the repo's G2 discipline quantizes
    monetary/ratio outputs via integer cents or decimal(38,x) BEFORE
    any rounding: `round` over DECIMAL inputs is half-up in both
    engines and fuzzes clean (see test_fuzz_decimal_round_half_up).
    If an engine upgrade changes either side, revisit the discipline
    note in SURVEY §7.4."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1.005,)], "x double")
    sp = df.select(F.round("x", 2).alias("r")).collect()[0].r
    du = oracle.execute(
        "SELECT round(cast(1.005 as double), 2)"
    ).fetchone()[0]
    assert sp == 1.01  # decimal-string HALF_UP
    assert du == 1.0  # binary-value rounding
    # and the agreement case both engines share: exact decimal input
    sp2 = spark.sql(
        "SELECT cast(round(cast('1.005' as decimal(18,3)), 2) as double) r"
    ).collect()[0].r
    du2 = oracle.execute(
        "SELECT cast(round(cast('1.005' as decimal(18,3)), 2) as double)"
    ).fetchone()[0]
    assert sp2 == du2 == 1.01


@settings(**SETTINGS)
@given(
    vals=st.lists(st.integers(-99999, 99999), min_size=0, max_size=25),
    digits=st.integers(0, 2),
)
def test_fuzz_decimal_round_half_up(spark, oracle, vals, digits):
    """The G2 quantization discipline's foundation, fuzzed: `round`
    over DECIMAL(18,3) inputs (constructed from integer millis, so the
    .xx5 half-way boundary is hit constantly) is HALF_UP (away from
    zero) in BOTH engines, for negative values too. A 300-sample
    offline sweep found zero divergences; this keeps the property
    pinned against engine upgrades."""
    rows = [
        (i, f"{'-' if v < 0 else ''}{abs(v) // 1000}.{abs(v) % 1000:03d}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "rid bigint, s string")
    from pyspark.sql import functions as F

    q = df.select(
        "rid",
        F.col("s")
        .cast("decimal(18,3)")
        .alias("x"),
    ).select("rid", F.round("x", digits).cast("double").alias("r"))
    t = pd.DataFrame(rows, columns=["rid", "s"]).astype(
        {"rid": "int64", "s": "object"}
    )
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                f"""
                SELECT rid,
                       cast(round(cast(s as decimal(18,3)), {digits})
                            as double) AS r
                FROM t
                """
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\nvals={vals}\ndigits={digits}\n{got}\n{want}"


def test_known_trycast_literal_acceptance_divergence(spark, oracle):
    """Executable documentation: TRY_CAST's accepted-literal grammar
    differs across engines. String->INT: DuckDB accepts decimal
    ('42.7' -> 43, banker's-free round-half-away), scientific ('1e3'),
    and hex ('0x1A') forms that Spark rejects to NULL. String->BOOLEAN:
    Spark accepts 'yes'/'no', DuckDB does not. The repo's ingest
    discipline (schema_cast_normalize, G11) therefore only try_casts
    strings already validated to the CANONICAL integer grammar
    ([+-]?digits, optional surrounding whitespace) — fuzzed clean in
    test_fuzz_trycast_canonical_grammar below."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("42.7",), ("1e3",), ("0x1A",)], "s string"
    )
    got = [
        r.v
        for r in df.select(F.col("s").try_cast("int").alias("v")).collect()
    ]
    assert got == [None, None, None]  # Spark: canonical grammar only
    duck = [
        oracle.execute(f"SELECT try_cast('{s}' AS INTEGER)").fetchone()[0]
        for s in ["42.7", "1e3", "0x1A"]
    ]
    assert duck == [43, 1000, 26]  # DuckDB: wider literal grammar
    sp_bool = spark.sql("SELECT try_cast('yes' as boolean) v").collect()[0].v
    du_bool = oracle.execute(
        "SELECT try_cast('yes' AS BOOLEAN)"
    ).fetchone()[0]
    assert sp_bool is True and du_bool is None


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.one_of(
            st.from_regex(r"\A *[+-]?[0-9]{1,6} *\Z"),
            st.sampled_from(["", " ", "abc", "--3", "+ 2", "9" * 30]),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_fuzz_trycast_canonical_grammar(spark, oracle, texts):
    """The safe try_cast subset both engines parse identically:
    canonical [+-]?digits integers with surrounding whitespace, plus
    rejection cases (empty, alpha, double sign, inner space, and
    30-digit overflow -> NULL in both)."""
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "rid bigint, s string")
    q = df.select("rid", F.col("s").try_cast("bigint").alias("v"))
    t = pd.DataFrame(rows, columns=["rid", "s"]).astype(
        {"rid": "int64", "s": "object"}
    )
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                "SELECT rid, try_cast(s AS BIGINT) AS v FROM t"
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\ntexts={texts!r}\nspark={got}\nduck ={want}"


def test_known_asc_null_ordering_default_divergence(spark, oracle):
    """Executable documentation: the DEFAULT null position under ORDER
    BY ... ASC diverges — Spark puts NULLS FIRST, DuckDB NULLS LAST
    (DESC agrees: both NULLS LAST). Immaterial to the driver's hash
    gate for full results (it repr-sorts rows), but LOAD-BEARING
    whenever a LIMIT/top-k cuts on a nullable sort key: the engines
    would keep different rows. Discipline: every ORDER BY+LIMIT over a
    possibly-null key states the null position explicitly on BOTH
    sides (cf. topk_limit's desc_nulls_last / NULLS LAST pair,
    operators/sorting.py)."""
    rows = [(1,), (None,), (2,), (None,), (0,)]
    df = spark.createDataFrame(rows, "k bigint")
    sp_default = [r.k for r in df.orderBy("k").collect()]
    assert sp_default[:2] == [None, None]  # Spark ASC: nulls first
    t = pd.DataFrame({"k": [1, None, 2, None, 0]}).astype({"k": "Int64"})
    oracle.register("t", t)
    try:
        du_default = [
            r[0]
            for r in oracle.execute(
                "SELECT k FROM t ORDER BY k"
            ).fetchall()
        ]
    finally:
        oracle.unregister("t")
    assert du_default[-2:] == [None, None]  # DuckDB ASC: nulls last


@settings(**SETTINGS)
@given(rows=ROWS, n=st.integers(1, 8))
def test_fuzz_limit_on_nullable_key_explicit_nulls(spark, oracle, rows, n):
    """ORDER BY a nullable key + LIMIT, with the null position stated
    explicitly on both sides (the discipline the divergence test above
    mandates) and a unique tiebreak (G3): the surviving row set must
    agree exactly."""
    from pyspark.sql import functions as F

    rows = [(i, k, v, c) for i, (k, v, c) in enumerate(rows)]
    df = spark.createDataFrame(rows, "rid bigint, " + SCHEMA)
    q = df.orderBy(
        F.col("k").asc_nulls_last(), F.col("rid").asc()
    ).limit(n)
    t = pd.DataFrame(rows, columns=["rid"] + PDF_COLS).astype(
        {"rid": "int64", "k": "Int64", "v": "int64", "c": "object"}
    )
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                f"SELECT * FROM t ORDER BY k ASC NULLS LAST, rid LIMIT {n}"
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\nrows={rows}\nn={n}\nspark={got}\nduck ={want}"


def test_known_negative_zero_groupkey_display_divergence(spark, oracle):
    """Executable documentation: both engines GROUP -0.0 and +0.0 into
    one group (IEEE equality), but the displayed key diverges — Spark
    normalizes the key to +0.0 inside the hash aggregate; DuckDB
    surfaces whichever representative it kept (here -0.0). A
    double-typed group key whose expression can produce -0.0 (e.g.
    x*0.0, -1*0.0) would therefore hash-mismatch the driver gate.
    Discipline: group keys are integers/decimals/strings throughout
    the registry; any future double key gets `+ 0.0` on the ORACLE
    side (DuckDB: -0.0 + 0.0 = +0.0) to match Spark's normalization."""
    df = spark.createDataFrame([(-0.0,), (0.0,)], "g double")
    sp = df.groupBy("g").count().collect()
    assert len(sp) == 1 and repr(sp[0].g) == "0.0"
    t = pd.DataFrame({"g": [-0.0, 0.0]})
    oracle.register("t", t)
    try:
        du = oracle.execute(
            "SELECT g, count(*) c FROM t GROUP BY g"
        ).fetchall()
        fixed = oracle.execute(
            "SELECT g + 0.0 AS g, count(*) c FROM t GROUP BY g + 0.0"
        ).fetchall()
    finally:
        oracle.unregister("t")
    assert len(du) == 1 and repr(du[0][0]) == "-0.0"  # the divergence
    assert len(fixed) == 1 and repr(fixed[0][0]) == "0.0"  # the fix


@settings(**SETTINGS)
@given(
    dates=st.lists(
        st.tuples(
            st.integers(1990, 2030),
            st.integers(1, 12),
            st.integers(1, 31),
            st.integers(-30, 30),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_fuzz_add_months_month_end_clamp(spark, oracle, dates):
    """Month arithmetic fuzz: Spark `add_months` vs DuckDB
    `date + INTERVAL n MONTH` (cast back to DATE — DuckDB widens to
    TIMESTAMP) agree everywhere, including end-of-month clamping
    (Jan 31 + 1m = Feb 29/28) and its non-associativity (+1m twice
    loses the 31st; +2m once keeps it) — both engines share the
    clamp-at-each-step semantic. Day components beyond the month's
    length are clamped at CONSTRUCTION time here (fixtures only carry
    valid dates)."""
    import calendar

    from pyspark.sql import functions as F

    rows = [
        (i, f"{y:04d}-{m:02d}-{min(d, calendar.monthrange(y, m)[1]):02d}", k)
        for i, (y, m, d, k) in enumerate(dates)
    ]
    df = spark.createDataFrame(rows, "rid bigint, d string, k int")
    q = df.select(
        "rid",
        F.date_format(
            F.add_months(F.col("d").cast("date"), F.col("k")), "yyyy-MM-dd"
        ).alias("out"),
    )
    t = pd.DataFrame(rows, columns=["rid", "d", "k"]).astype(
        {"rid": "int64", "d": "object", "k": "int64"}
    )
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                """
                SELECT rid,
                       strftime(cast(cast(d AS DATE)
                                + to_months(cast(k AS INTEGER)) AS DATE),
                                '%Y-%m-%d') AS out
                FROM t
                """
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\ndates={dates}\nspark={got}\nduck ={want}"


def test_known_integer_division_semantics(spark, oracle):
    """Executable documentation of G15: on NEGATIVE operands, Spark
    `div` and DuckDB `//` both TRUNCATE toward zero (-5 div 2 = -2) —
    they pair safely — while Spark `floor(a/b)` FLOORS (-5/2 → -3).
    An oracle that pairs floor() with // silently disagrees by one on
    every negative numerator (caught live by hostile credit-memo rows
    in three avg/quantization oracles). The repo's discipline: `div`
    pairs with `//`; floor-semantics divisions use the modular
    identity (q - ((q % d) + d) % d) // d on the DuckDB side and
    r - pmod(r, d) (or floor of exact division) on the Spark side."""
    sp = spark.sql(
        "SELECT -5 div 2 AS t, CAST(floor(-5 / 2) AS BIGINT) AS f, "
        "pmod(-5, 2) AS p"
    ).collect()[0]
    assert (sp.t, sp.f, sp.p) == (-2, -3, 1)
    du_t, du_mod = oracle.execute("SELECT -5 // 2, -5 % 2").fetchone()
    assert du_t == -2  # truncation, pairs with Spark div
    assert du_mod == -1  # sign follows dividend, pairs with Spark %
    du_floor = oracle.execute(
        "SELECT (-5 - ((-5 % 2) + 2) % 2) // 2"
    ).fetchone()[0]
    assert du_floor == -3  # the modular identity recovers floor


@settings(**SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(-10000, 10000),
            st.integers(1, 50),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_fuzz_integer_division_pairings(spark, oracle, pairs):
    """The two sanctioned division pairings fuzzed over signed
    NUMERATORS and positive divisors (the repo's divisors are counts
    and scale constants — the modular floor identity REQUIRES d > 0;
    with d < 0 it computes ceil): Spark `a div b` ≡ DuckDB `a // b`
    (truncation), Spark `a - pmod(a, b)` over b ≡ the DuckDB modular
    floor identity, and `a % b` ≡ `a % b` (sign follows dividend in
    both)."""
    rows = [(i, a, d) for i, (a, d) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "rid bigint, a bigint, d bigint")
    q = df.selectExpr(
        "rid",
        "a div d AS trunc_div",
        "a % d AS rem",
        "CAST((a - pmod(a, d)) / d AS BIGINT) AS floor_div",
    )
    t = pd.DataFrame(rows, columns=["rid", "a", "d"]).astype("int64")
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                """
                SELECT rid,
                       a // d AS trunc_div,
                       a % d AS rem,
                       (a - ((a % d) + abs(d)) % abs(d)) // d AS floor_div
                FROM t
                """
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\npairs={pairs}\nspark={got}\nduck ={want}"


def test_known_sum_bigint_overflow_divergence(spark, oracle):
    """Executable documentation: a BIGINT sum that exceeds 2^63-1 KILLS
    a Spark ANSI job (ArithmeticException) while DuckDB silently
    auto-promotes the accumulator to HUGEINT and returns the exact
    value. This is why every potentially-wide integer fold in the repo
    (squared cents, µ² ADC terms, shingle products) accumulates in
    decimal(38,0) on the Spark side paired with HUGEINT on the oracle
    side (G11 overflow class) — sum(bigint) is only used where the
    magnitude is provably bounded."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    df = spark.createDataFrame(
        [(9223372036854775807,), (1,)], "x bigint"
    )
    with _pytest.raises(ArithmeticException):
        df.selectExpr("sum(x) AS s").collect()
    assert (
        oracle.execute(
            "SELECT sum(x) FROM (VALUES (9223372036854775807), (1)) t(x)"
        ).fetchone()[0]
        == 9223372036854775808
    )
    # the repo's discipline: decimal(38,0) ↔ HUGEINT agree exactly
    got = df.selectExpr(
        "cast(sum(cast(x as decimal(38,0))) as string) AS s"
    ).collect()[0].s
    assert got == "9223372036854775808"


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.one_of(
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, width=64
            ),
            st.sampled_from([float("nan"), float("inf"), float("-inf")]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_fuzz_nan_inf_extrema_agree(spark, oracle, vals):
    """min/max/greatest-style extrema over doubles containing NaN/±Inf
    agree across engines: both order NaN ABOVE +Inf (so max prefers
    NaN, min ignores it) — pinned so an engine upgrade changing IEEE
    total-order handling is caught. Sums/avgs are excluded: any NaN
    poisons them identically (probed), but Inf-heavy sums produce
    order-dependent NaN vs Inf, which the G2 quantization discipline
    already forbids in oracled outputs."""
    import math

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "rid bigint, x double")
    got = df.selectExpr(
        "max(x) AS mx", "min(x) AS mn", "count(x) AS n"
    ).collect()[0]

    # literal VALUES, not a registered pandas frame: pandas uses NaN as
    # its float NULL marker, so DuckDB would read every NaN as NULL and
    # the comparison would silently test nothing
    def lit(v):
        if math.isnan(v):
            return "'nan'::DOUBLE"
        if math.isinf(v):
            return f"'{'-' if v < 0 else ''}inf'::DOUBLE"
        # G13 (decimal-literal pipeline hazard): a bare decimal literal
        # parses as DECIMAL(w,s) in DuckDB, whose int64-scaled → DOUBLE
        # conversion can land 1 ulp off the correctly-rounded value repr
        # round-trips to (seen live: 1.9999999998835847 → ...5847 vs
        # ...585). An exponent suffix forces the DOUBLE literal parser.
        s = repr(v)
        return f"CAST({s if 'e' in s else s + 'e0'} AS DOUBLE)"

    values = ", ".join(f"({lit(v)})" for v in vals)
    want = oracle.execute(
        f"SELECT max(x) AS mx, min(x) AS mn, count(x) AS n "
        f"FROM (VALUES {values}) t(x)"
    ).fetchone()
    assert (repr(got.mx), repr(got.mn), got.n) == (
        repr(want[0]),
        repr(want[1]),
        want[2],
    ), f"\nvals={vals}\nspark={got}\nduck ={want}"


HASHABLE = st.one_of(
    st.integers(-(10**9), 10**9),
    st.text(
        alphabet=st.sampled_from(list("ab|#é你 🙂'\"\\")), max_size=8
    ),
)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(HASHABLE, HASHABLE), min_size=0, max_size=25
    ),
    width=st.integers(1, 15),
    mod=st.integers(1, 1_000_000),
)
def test_fuzz_seeded_hash_discipline(spark, oracle, rows, width, mod):
    """The deterministic-randomness foundation every sampler/bootstrap/
    split/DP-noise operator stands on, fuzzed end to end:
    md5(concat_ws('|', int_as_string, text)) must agree byte-for-byte
    (unicode included — both engines hash UTF-8), and the hex-prefix →
    integer window (Spark conv(_,16,10) ↔ DuckDB '0x'-cast, % mod)
    must agree for EVERY prefix width 1..15. Width 16 is the cliff —
    pinned separately in test_known_hex16_overflow_cliff; the repo
    stays at ≤8 hex chars by discipline."""
    from pyspark.sql import functions as F

    data = [(i, a, b) for i, (a, b) in enumerate(rows)]
    df = spark.createDataFrame(
        [(i, str(a), str(b)) for i, a, b in data],
        "rid bigint, a string, b string",
    )
    h = F.md5(F.concat_ws("|", F.col("a"), F.col("b")))
    q = df.select(
        "rid",
        h.alias("h"),
        (
            F.conv(F.substring(h, 1, width), 16, 10).cast("bigint") % mod
        ).alias("u"),
    )
    t = pd.DataFrame(
        [(i, str(a), str(b)) for i, a, b in data],
        columns=["rid", "a", "b"],
    ).astype({"rid": "int64", "a": "object", "b": "object"})
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                f"""
                SELECT rid, md5(concat_ws('|', a, b)) AS h,
                       CAST(('0x' || substr(md5(concat_ws('|', a, b)),
                                            1, {width})) AS BIGINT)
                           % {mod} AS u
                FROM t
                """
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\nrows={rows}\nw={width} m={mod}\n{got}\n{want}"


def test_known_hex16_overflow_cliff(spark, oracle):
    """Executable documentation: a FULL 16-hex-char md5 prefix can
    exceed BIGINT — Spark's conv()->cast raises under ANSI, DuckDB's
    BIGINT cast errors too, and only DuckDB's UBIGINT accepts it
    (Spark has no unsigned 64-bit type to pair with). Hence the seeded
    -hash discipline caps prefixes at 8 hex chars (32 bits) repo-wide;
    widths 1..15 fuzz clean above."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import NumberFormatException

    df = spark.createDataFrame([("f" * 16,)], "h string")
    with _pytest.raises(NumberFormatException):
        df.selectExpr(
            "cast(conv(h, 16, 10) as bigint) AS v"
        ).collect()
    assert (
        oracle.execute("SELECT CAST('0x' || repeat('f', 16) AS UBIGINT)")
        .fetchone()[0]
        == 18446744073709551615
    )


def test_known_string_edge_divergences(spark, oracle):
    """Executable documentation of three string-function edges OUTSIDE
    the repo's usage domain (every repo substr start is a 1-based
    constant, every pad non-empty, every left/right length ≥ 0):
    substring(s, 0, n) counts position 0 against the length in DuckDB
    but not Spark; lpad with an EMPTY pad errors in DuckDB and
    truncates-or-returns in Spark; left(s, -n) is '' in Spark but
    drop-last-n (Python-style) in DuckDB. The fuzz below locks the
    SAFE domain both engines share."""
    assert (
        spark.sql("SELECT substring('abcdef', 0, 3) x").collect()[0].x
        == "abc"
    )
    assert oracle.execute("SELECT substr('abcdef', 0, 3)").fetchone()[0] == (
        "ab"
    )
    assert spark.sql("SELECT lpad('abc', 6, '') x").collect()[0].x == "abc"
    import duckdb as _d

    try:
        oracle.execute("SELECT lpad('abc', 6, '')")
        raised = False
    except _d.Error:
        raised = True
    assert raised
    assert spark.sql("SELECT left('abc', -1) x").collect()[0].x == ""
    assert oracle.execute("SELECT left('abc', -1)").fetchone()[0] == "ab"


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(list("ab é你|")), max_size=10),
        min_size=0,
        max_size=20,
    ),
    start=st.integers(1, 12),
    ln=st.integers(0, 12),
)
def test_fuzz_string_functions_safe_domain(spark, oracle, texts, start, ln):
    """substr (1-based start, incl. past end), lpad/rpad (non-empty
    pad), left/right (n ≥ 0), repeat, split_part and trim over
    unicode-bearing strings — the domain the repo's string oracles
    live in — must agree byte-for-byte."""
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "rid bigint, s string")
    q = df.select(
        "rid",
        F.substring("s", start, ln).alias("sub"),
        F.lpad("s", ln, "xy").alias("lp"),
        F.rpad("s", ln, "xy").alias("rp"),
        F.expr(f"left(s, {ln})").alias("lft"),
        F.expr(f"right(s, {ln})").alias("rgt"),
        F.repeat(F.col("s"), 2).alias("rep"),
        F.expr("split_part(s, '|', 1)").alias("sp1"),
        F.trim(F.col("s")).alias("tr"),
    )
    t = pd.DataFrame(rows, columns=["rid", "s"]).astype(
        {"rid": "int64", "s": "object"}
    )
    oracle.register("t", t)
    try:
        got = _canon(q.toPandas())
        want = _canon(
            oracle.execute(
                f"""
                SELECT rid,
                       substr(s, {start}, {ln}) AS sub,
                       lpad(s, {ln}, 'xy') AS lp,
                       rpad(s, {ln}, 'xy') AS rp,
                       left(s, {ln}) AS lft,
                       right(s, {ln}) AS rgt,
                       repeat(s, 2) AS rep,
                       split_part(s, '|', 1) AS sp1,
                       trim(s) AS tr
                FROM t
                """
            ).df()
        )
    finally:
        oracle.unregister("t")
    assert got == want, f"\ntexts={texts}\nstart={start} ln={ln}\n{got}\n{want}"


MAGNITUDES = st.sampled_from(
    [1e17, -1e17, 1.0, -1.0, 1e-8, 3.14159, 2.0**-30]
)


@settings(**SETTINGS)
@given(
    arrs=st.lists(
        st.lists(
            st.tuples(
                MAGNITUDES,
                st.floats(0.0, 1.0, allow_nan=False, width=64),
            ).map(lambda p: p[0] * p[1]),
            min_size=1,
            max_size=64,
        ),
        min_size=0,
        max_size=12,
    )
)
def test_fuzz_hof_fold_order(spark, oracle, arrs):
    """The dot-product / entropy / Holt foundation: Spark's sequential
    ``F.aggregate`` fold over a DOUBLE array column and DuckDB's
    ``list_sum`` agree to the LAST BIT even on order-sensitive
    magnitude mixes (±1e17 beside 1e-8, where any re-association or
    pairwise summation would change the result) — provided the values
    travel as COLUMNS. Literal SQL text does NOT give this guarantee:
    see test_known_decimal_literal_pipeline_divergence."""
    rows = [(i, a) for i, a in enumerate(arrs)]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "rid bigint, a array<double>")
    got = {
        r.rid: repr(r.s)
        for r in df.select(
            "rid",
            F.aggregate(
                "a", F.lit(0.0), lambda acc, x: acc + x
            ).alias("s"),
        ).collect()
    }
    if not rows:  # empty pandas frame types 'a' as float64, not list
        assert got == {}
        return
    t = pd.DataFrame(
        {"rid": [r[0] for r in rows], "a": [r[1] for r in rows]}
    )
    oracle.register("t", t)
    try:
        want = {
            rid: repr(v)
            for rid, v in oracle.execute(
                "SELECT rid, list_sum(a) FROM t"
            ).fetchall()
        }
    finally:
        oracle.unregister("t")
    assert got == want, f"\narrs={arrs}\n{got}\n{want}"


def test_known_decimal_literal_pipeline_divergence(spark, oracle):
    """Executable documentation of a TESTING-discipline hazard, not an
    engine bug: a bare float literal in SQL text parses as DECIMAL in
    both engines (Spark decimal(17,17), DuckDB DECIMAL(18,17)), and
    the two then take different pipelines — DuckDB's list_sum adds the
    decimals EXACTLY and converts to double once; Spark's fold casts
    each element to double first — so literal-built arrays can differ
    in the last ulp even though COLUMN-path folds are bit-identical
    (the fuzz above). Discipline: cross-engine float comparisons move
    data through columns (parquet/Arrow), never through SQL literals."""
    assert (
        spark.sql("SELECT typeof(0.29022451306521935) t").collect()[0].t
        == "decimal(17,17)"
    )
    assert (
        oracle.execute("SELECT typeof(0.29022451306521935)").fetchone()[0]
        == "DECIMAL(18,17)"
    )
    # and the double CAST of the single literal still agrees —
    # the divergence only appears in multi-element literal folds
    s = spark.sql(
        "SELECT cast(0.29022451306521935 as double) x"
    ).collect()[0].x
    d = oracle.execute(
        "SELECT CAST(0.29022451306521935 AS DOUBLE)"
    ).fetchone()[0]
    assert repr(s) == repr(d)


def test_known_null_event_time_window_drop(spark, oracle):
    """Executable documentation of the NULL-event-time class (G17): a
    row whose ts is NULL is DROPPED by Spark's window()/session_window
    (no window can be assigned) but kept as a NULL bucket by DuckDB's
    time_bucket — and Spark's own date_trunc groupBy keeps a NULL
    group, so even within Spark the treatment is construct-dependent.
    A one-row probe against the sf fixture schema showed 18 of 89
    event/window queries diverge on a single NULL-ts row. The repo's
    position: an event without a timestamp cannot participate in
    event-time analytics — ingest validation quarantines it
    (bound_event_time's >= filter already drops NULLs), and the
    hostile fixture poisons ts with extreme VALUES (epoch, far-future)
    rather than NULL because no per-query patching can reconcile a
    construct-level drop-vs-keep split."""
    import datetime

    from pyspark.sql import functions as F

    rows = [(1, datetime.datetime(2024, 1, 15, 12, 0, 0)), (2, None)]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp_ntz")
    win = df.groupBy(F.window("ts", "1 hour")).count().collect()
    assert len(win) == 1 and win[0]["count"] == 1  # NULL row dropped
    sess = df.groupBy(F.session_window("ts", "30 minutes")).count().collect()
    assert len(sess) == 1  # NULL row dropped
    trunc = df.groupBy(F.date_trunc("hour", "ts")).count().collect()
    assert len(trunc) == 2  # but date_trunc KEEPS a NULL group
    duck = oracle.execute(
        "SELECT time_bucket(INTERVAL 1 HOUR, ts) AS b, count(*) "
        "FROM (VALUES (TIMESTAMP '2024-01-15 12:00:00'), "
        "(NULL::TIMESTAMP)) t(ts) GROUP BY b"
    ).fetchall()
    assert len(duck) == 2  # DuckDB keeps the NULL bucket
    # the ingest guard that restores a single semantic on both engines
    from noaa_etl_daily_spark.streaming import bound_event_time

    guarded = bound_event_time(
        df.withColumn("ts", F.col("ts").cast("timestamp")),
        "2024-01-01 00:00:00",
        "2024-02-01 00:00:00",
    )
    assert guarded.count() == 1  # NULL ts quarantined at ingest


@settings(**SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(
            st.one_of(
                st.none(),
                st.integers(-(10**6), 10**6),
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    width=64,
                ),
            ),
            st.one_of(
                st.none(),
                st.sampled_from([0, 0.0, -0.0]),
                st.integers(-(10**3), 10**3),
                st.floats(
                    min_value=-1e3,
                    max_value=1e3,
                    allow_nan=False,
                    width=64,
                ),
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_fuzz_try_divide_matches_duckdb_division(spark, oracle, pairs):
    """The G18 discipline's foundation, fuzzed: Spark ``try_divide``
    over doubles must agree with DuckDB's plain ``/`` on EVERY operand
    class a degenerate or hostile corpus produces — zero (int and both
    float signs), NULL on either side, and ordinary values. This is
    what licenses fixing ANSI DIVIDE_BY_ZERO crashes on the Spark side
    alone, with no oracle edits (x/0 → NULL natively in DuckDB).

    Quantized comparison (round 9dp) per the G2 discipline — the
    division itself is a single IEEE op, identical on both engines;
    the rounding only canonicalizes repr."""
    rows = [
        (i, None if a is None else float(a), None if b is None else float(b))
        for i, (a, b) in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows, "rid bigint, a double, b double")
    got = {
        r.rid: r.q
        for r in df.selectExpr(
            "rid", "round(try_divide(a, b), 9) AS q"
        ).collect()
    }

    def lit(v):
        if v is None:
            return "NULL::DOUBLE"
        s = repr(v)
        return f"CAST({s if 'e' in s else s + 'e0'} AS DOUBLE)"

    values = ", ".join(
        f"({i}, {lit(a)}, {lit(b)})"
        for i, (a, b) in enumerate(
            (None if a is None else float(a), None if b is None else float(b))
            for a, b in pairs
        )
    )
    want = dict(
        oracle.execute(
            f"SELECT rid, round(a / b, 9) FROM (VALUES {values}) "
            f"t(rid, a, b)"
        ).fetchall()
    )
    import math

    for rid in got:
        g, w = got[rid], want[rid]
        if g is not None:
            g = g + 0.0  # -0.0 → 0.0; see the round(-0.0) pin below
        if w is not None:
            w = w + 0.0
        if g is not None and w is not None and abs(w) >= 9e6:
            # Pinned engine boundary (found by this fuzz in r13:
            # a/b = 290917 / 1.192092896e-07 ≈ 2.44e12 → spark
            # ...528.42 vs duck ...528.4204): above |q| ≈ 2^53/1e9 the
            # 9-dp grid is coarser than a double ULP, and the engines'
            # round() implementations (BigDecimal-exact vs floating
            # x*1e9 paths) legitimately land 1 ULP apart. No registry
            # query rounds magnitudes that large at 9 dp (G2 rounds
            # ratios/shares; big magnitudes round at 2 dp), so the
            # differential requirement out here is ULP agreement, not
            # repr equality.
            assert g == w or abs(g - w) <= 2 * math.ulp(abs(w)), (
                f"rid={rid}: a,b={pairs[rid]} spark={g!r} duck={w!r}"
            )
            continue
        assert (g is None and w is None) or repr(g) == repr(w), (
            f"rid={rid}: a,b={pairs[rid]} spark={g!r} duck={w!r}"
        )


def test_known_round_negative_zero_divergence(spark, oracle):
    """G14 family, pinned by the try_divide fuzz's first run: the
    DIVISION agrees bit-for-bit (0.0/-1.0 = -0.0 on both engines), but
    Spark's round() CANONICALIZES -0.0 to +0.0 while DuckDB's round()
    preserves the sign bit. Latent hazard: any query whose G2 output
    rounding can see a -0.0 (a negated zero sum, a zero ratio with a
    negative numerator path) hash-diverges even though every magnitude
    matches. Mitigation when it bites: append `+ 0.0` on the ORACLE
    side (IEEE -0.0 + 0.0 = +0.0), matching Spark's round. No current
    registry query emits -0.0 — the full differentials prove that —
    so this stays a pinned boundary, not a fix."""
    s = spark.sql(
        "SELECT try_divide(0.0D, -1.0D) AS raw, "
        "round(try_divide(0.0D, -1.0D), 9) AS rounded"
    ).collect()[0]
    assert repr(s.raw) == "-0.0"      # division preserves the sign bit
    assert repr(s.rounded) == "0.0"   # Spark round canonicalizes
    raw, rounded, fixed = oracle.execute(
        "SELECT 0.0e0 / -1.0e0, round(0.0e0 / -1.0e0, 9), "
        "round(0.0e0 / -1.0e0, 9) + 0.0"
    ).fetchone()
    assert repr(raw) == "-0.0"
    assert repr(rounded) == "-0.0"    # DuckDB round preserves it
    assert repr(fixed) == "0.0"       # the + 0.0 normalization
