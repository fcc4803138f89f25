"""Tests for the engine-surface wave: SQL UDF inlining, observe()
metrics retrieval, closed-form OLS vs numpy, and feature-hashing
determinism. The value-level Spark-vs-DuckDB diff for these queries
runs in test_oracle.py like every other registered key; these tests
cover the claims the oracle can't (plan shape, driver-side metrics,
agreement with an independent solver)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from noaa_etl_daily_spark.registry import REGISTRY, load_all
from noaa_etl_daily_spark.tables import load

load_all()  # populate REGISTRY (imports the operators package)


def test_sql_udf_query_is_fully_inlined(spark, sf_dir):
    """The SQL-language UDF must be substituted by Catalyst — no Python
    evaluation node, no ScalaUDF: the physical plan is plain codegen'd
    arithmetic (the whole point of choosing this UDF tier)."""
    df = REGISTRY["sql_udf_create_function"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert bad not in plan, plan
    # the function body's arithmetic appears inlined in the aggregate
    assert "round(" in plan.lower()


def test_sql_table_function_pushes_filter_into_scan(spark, sf_dir):
    """The TVF's status predicate must reach the parquet scan as a
    pushed filter — proof the function body is inlined, not
    materialized-then-filtered."""
    df = REGISTRY["sql_table_function_create"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1][:200], plan


def test_session_variable_folds_to_literal_filter(spark, sf_dir):
    """After SET VAR, consumers filter on a LITERAL (constant-folded) —
    the optimized plan contains no subquery or join for the threshold."""
    df = REGISTRY["sql_session_variables"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan
    assert "variablereference" in plan.lower() or "Filter" in plan


def test_observe_metrics_match_independent_counts(spark, sf_dir):
    """Observation retrieval: the QC counters collected as a side
    effect of one action equal independently-computed counts."""
    obs = Observation()
    li = load(spark, sf_dir, "lineitem")
    df = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.sum((F.col("l_discount") > 0.10).cast("long")).alias(
            "disc_over_cap"
        ),
    )
    df.groupBy("l_linestatus").count().collect()  # the one action
    got = obs.get
    expected_rows = li.count()
    expected_null = li.filter(F.col("l_quantity").isNull()).count()
    expected_cap = li.filter(F.col("l_discount") > 0.10).count()
    assert got["rows_seen"] == expected_rows
    assert got["null_qty"] == expected_null
    assert got["disc_over_cap"] == expected_cap


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    """Closed-form normal-equation OLS agrees with numpy's QR-based
    lstsq on the identical quantized design matrix (independent
    algorithm, same answer)."""
    row = (
        REGISTRY["agg_linear_regression_normal_eq"]
        .builder(spark, sf_dir)
        .collect()[0]
    )
    pdf = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.round("l_quantity").cast("bigint").alias("x1"),
            F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("y"),
        )
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(pdf)), pdf.x1.to_numpy(float), pdf.x2.to_numpy(float)]
    )
    y = pdf.y.to_numpy(float)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row.n == len(pdf)
    assert row.b0_cents == pytest.approx(beta[0], rel=1e-6, abs=1e-3)
    assert row.b1_cents_per_unit == pytest.approx(beta[1], rel=1e-6)
    assert row.b2_cents_per_disc_pct == pytest.approx(
        beta[2], rel=1e-6, abs=1e-3
    )
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert row.r2 == pytest.approx(1 - ss_res / ss_tot, abs=1e-5)
    # the fixture's columns are synthetically independent, so R² is
    # near zero — the assertion that matters is agreement with numpy
    assert 0.0 <= row.r2 <= 1.0


def test_feature_hashing_matches_python_reimplementation(spark, sf_dir):
    """The 16-bucket hashed vector equals a from-scratch Python
    reimplementation (md5-prefix bucketing) on a sample of documents —
    and is deterministic across runs."""
    out = (
        REGISTRY["llm_feature_hashing_vector"]
        .builder(spark, sf_dir)
        .limit(20)
        .collect()
    )
    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def py_vec(text: str):
        toks = [t for t in text.lower().split(" ") if t != ""]
        counts = [0] * 16
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 16
            counts[b] += 1
        vec = ",".join(
            f"{k}:{c}" for k, c in enumerate(counts) if c > 0
        )
        nnz = sum(1 for c in counts if c > 0)
        l2sq = sum(c * c for c in counts)
        return len(toks), nnz, l2sq, vec

    assert out, "no rows"
    for r in out:
        n_tok, nnz, l2sq, vec = py_vec(docs[r.doc_id])
        assert (r.n_tokens, r.nnz, r.l2sq, r.vec) == (
            n_tok,
            nnz,
            l2sq,
            vec,
        ), r.doc_id


def test_file_metadata_counts_match_table(spark, sf_dir):
    """_metadata per-file row counts must sum to the table's row count,
    and max_row_index must be count-1 (0-based, dense)."""
    rows = (
        REGISTRY["scan_file_metadata_column"].builder(spark, sf_dir).collect()
    )
    total = load(spark, sf_dir, "orders").count()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        assert r.max_row_index == r.n_rows - 1
