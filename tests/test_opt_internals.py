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
