"""Focused tests for the r12 optimization-round internals changes:

- ``_dbl_array_lit``: the single-parse SQL literal builder must be
  BIT-identical to the nested ``F.lit`` idiom it replaced (the trained
  PQ codebooks / LSH planes / k-means centroids all ride through it).
- ``_spread``: the pre-compute repartition must still fan a
  single-split fixture scan out to ``defaultParallelism``, but must
  become a NO-OP (no RoundRobin exchange in the plan) when the input
  is already at least that parallel — the 100 TB shape.
- ``_nearest_cell``: the scan-stage argmax cell assignment must agree
  row-for-row with the crossJoin×K + window form it replaced,
  including NULL-cosine (zero-norm) tie-break semantics.
- ``pin`` (r13): the shared fan-out materialization helper must take
  the checkpoint branch on small inputs, the recompute branch above the
  size gate (same rows either way), and a ``required=True`` pin must
  survive both the debug knob and the gate.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _flat(v):
    out = []
    for e in v:
        if isinstance(e, (list, tuple)):
            out.extend(_flat(e))
        else:
            out.append(e)
    return out


def test_dbl_array_lit_bit_equals_nested_flit(spark):
    from noaa_etl_daily_spark.operators.llm import (
        _LSH_MP_PLANES,
        _LSH_PLANES,
        _dbl_array_lit,
    )

    rng = np.random.RandomState(0)
    cases = [
        list(rng.standard_normal(64)),
        [list(x) for x in rng.standard_normal((32, 8)) * 1e6],
        # signed zero, denormals, huge magnitudes, long mantissas
        [0.0, -0.0, 1e-310, -1e-310, 1e308, -1e308,
         123456789.123456789, 2.5e-15],
        [list(p) for p in _LSH_PLANES[0]],
        [list(p) for p in _LSH_MP_PLANES[1]],
    ]

    def old_lit(a):
        if isinstance(a[0], (list, tuple)):
            return F.array(*[old_lit(x) for x in a])
        return F.array(*[F.lit(float(x)) for x in a])

    df = spark.range(1)
    for case in cases:
        row = df.select(
            old_lit(case).alias("o"), _dbl_array_lit(case).alias("n")
        ).first()
        bits = [struct.pack(">d", x) for x in _flat(row.o)]
        assert bits == [struct.pack(">d", x) for x in _flat(row.n)]


def test_spread_fans_out_single_split_scan(spark, sf_dir):
    from noaa_etl_daily_spark.operators.llm import _spread
    from noaa_etl_daily_spark.tables import load

    n = spark.sparkContext.defaultParallelism
    docs = load(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() < n  # fixture premise: few splits
    assert _spread(docs).rdd.getNumPartitions() == n


def test_spread_is_noop_on_already_parallel_input(spark, sf_dir):
    from noaa_etl_daily_spark.operators.llm import _spread
    from noaa_etl_daily_spark.tables import load

    n = spark.sparkContext.defaultParallelism
    wide = load(spark, sf_dir, "documents").repartition(n)
    out = _spread(wide)
    assert out is wide  # no second exchange stacked on top
    # belt-and-braces: exactly the test's own round-robin, no second one
    # (AQE's toString repeats the tree under "Initial Plan" — take the
    # final-plan section only)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("RoundRobinPartitioning") == 1


def test_nearest_cell_matches_window_form(spark, sf_dir):
    from noaa_etl_daily_spark.operators.llm import _dot, _nearest_cell

    # 6 vectors incl. a zero vector (NULL cosine vs every cell) and an
    # exact tie candidate; 3 cells incl. a zero-sum cell (NULL cosine
    # vs every vector).
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [1.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),   # zero norm -> NULL sim everywhere
        (4, [-1.0, 0.0, 0.0, 0.0]),
        (5, [3.0, 0.0, 0.0, 0.0]),   # colinear with vec 0 and cell 10
    ]
    cells = [
        (10, [2.0, 0.0, 0.0, 0.0]),
        (11, [0.0, 2.0, 0.0, 0.0]),
        (12, [0.0, 0.0, 0.0, 0.0]),  # zero cell -> NULL sim everywhere
    ]
    v = spark.createDataFrame(vecs, "vec_id long, m array<double>")
    cb = spark.createDataFrame(cells, "cell long, c array<double>")

    got = {
        r.vec_id: r.cell
        for r in _nearest_cell(v, cb, "vec_id").collect()
    }

    sim9 = F.round(
        F.try_divide(
            _dot(F.col("m"), F.col("c")),
            F.sqrt(
                _dot(F.col("m"), F.col("m")) * _dot(F.col("c"), F.col("c"))
            ),
        ),
        9,
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cell")
    ref = {
        r.vec_id: r.cell
        for r in v.crossJoin(F.broadcast(cb))
        .select("vec_id", "m", "cell", sim9.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == ref
    assert got[3] == 10  # all-NULL sims tie-break to smallest cell


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("Initial Plan")[0]


def test_pin_size_gate_both_branches(spark, sf_dir, monkeypatch):
    """The r13 size gate: a corpus-proportional frame is pinned (Scan
    ExistingRDD in the plan) while its bounding input is small, and
    falls back to recompute (no ExistingRDD — the r12-pre shape, always
    correct) above the threshold, with identical rows either way.
    llm_dedup_containment carries two gated pins (chunks, informative)
    and no ``required`` ones, so both branches are visible in its
    plan."""
    from noaa_etl_daily_spark.registry import load_all

    builder = load_all()["llm_dedup_containment"].builder

    monkeypatch.delenv("SPARK_GRAFT_CKPT_MAX_INPUT_BYTES", raising=False)
    pinned = builder(spark, sf_dir)
    assert "ExistingRDD" in _final_plan(pinned)

    monkeypatch.setenv("SPARK_GRAFT_CKPT_MAX_INPUT_BYTES", "0")
    recomputed = builder(spark, sf_dir)
    assert "ExistingRDD" not in _final_plan(recomputed)

    assert pinned.collect() == recomputed.collect()


def test_pin_required_survives_knob_and_gate(spark, monkeypatch):
    """scale_rank's partition-id handshake pin is correctness, not a
    perf dedup: neither the plan-dump knob nor the size gate may
    disable it — while both DO disable the non-required forms."""
    from noaa_etl_daily_spark.operators.materialize import pin

    monkeypatch.setenv("SPARK_GRAFT_NO_CKPT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CKPT_MAX_INPUT_BYTES", "0")
    df = spark.range(10)
    assert pin(df) is df
    assert pin(df, approx_input_bytes=123) is df
    required = pin(df, required=True)
    assert required is not df
    assert "ExistingRDD" in _final_plan(required)


def test_recursive_cte_unroll_is_k_invariant(spark, sf_dir):
    """r13: sql_recursive_cte advances K months per UnionLoop iteration
    (VERDICT r12 item 3). The emitted balances must be BIT-identical for
    every K — including K=1 (the r12 sequential form, modulo the batch
    carrier), a K that straddles the month count mid-batch, and a K
    larger than the whole spine (one partial batch, no second
    iteration) — because each batch entry repeats the sequential nested
    double arithmetic rather than any reassociated closed form."""
    from noaa_etl_daily_spark.operators.aggregates import (
        _RC_UNROLL,
        _rc_unrolled_sql,
        sql_recursive_cte,
    )

    base = sql_recursive_cte(spark, sf_dir)  # registers _rc_idx view
    want = sorted(
        (r.month, r.rev, r.balance) for r in base.collect()
    )
    assert want, "fixture must have months"
    for k in (1, 7, len(want) - 1, len(want) + 5):
        if k == _RC_UNROLL or k < 1:
            continue
        got = sorted(
            (r.month, r.rev, r.balance)
            for r in spark.sql(_rc_unrolled_sql(k)).collect()
        )
        assert got == want, f"K={k} diverged"


def test_pin_gate_arithmetic_and_unknown_inputs(spark, monkeypatch):
    from noaa_etl_daily_spark.operators.materialize import (
        _MAX_BYTES_DEFAULT,
        _UNKNOWN_BYTES,
        input_size_bytes,
        pin,
    )

    monkeypatch.delenv("SPARK_GRAFT_NO_CKPT", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_CKPT_MAX_INPUT_BYTES", raising=False)
    df = spark.range(10)
    assert pin(df, approx_input_bytes=_MAX_BYTES_DEFAULT + 1) is df
    assert pin(df, approx_input_bytes=_MAX_BYTES_DEFAULT) is not df
    # a table that cannot be sized reads as corpus-sized -> recompute
    assert input_size_bytes("/nonexistent", "documents") == _UNKNOWN_BYTES
    assert pin(df, approx_input_bytes=_UNKNOWN_BYTES) is df
