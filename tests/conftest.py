"""Shared pytest fixtures: one SparkSession + DuckDB oracle per run, and the
Spark↔DuckDB differential comparison helper that mirrors the driver's
row-count + schema + order-insensitive value-hash check (SURVEY.md §5.2.4)
but stricter: it diffs actual values so failures are debuggable."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from noaa_etl_daily_spark.session import get_spark

    spark = get_spark(app_name="noaa-etl-daily-spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the fixture views pre-registered, exactly as
    the driver does it."""
    con = duckdb.connect()
    from noaa_etl_daily_spark.tables import TABLE_NAMES

    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def _cell_key(v):
    """Make any cell sortable/hashable (arrays → tuples, NaN-stable)."""
    if isinstance(v, (list, np.ndarray)):
        return tuple(_cell_key(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _cell_key(x)) for k, x in v.items()))
    if isinstance(v, float) and np.isnan(v):
        return "\x00NaN"
    if v is None or v is pd.NaT:
        return "\x00None"
    return v


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize timestamp precision, sort rows."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).reset_index(drop=True)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            col = pdf[c]
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            pdf[c] = col.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    if len(pdf):
        order = np.lexsort(
            [pdf[c].map(_cell_key).astype(str).to_numpy() for c in reversed(pdf.columns)]
        )
        pdf = pdf.iloc[order].reset_index(drop=True)
    return pdf


def _assert_no_nested_cells(pdf: pd.DataFrame, side: str) -> None:
    """The driver canonicalizes with pandas ``sort_values`` over every
    column, which raises ``TypeError: unhashable type: 'list'`` on any
    array/map/struct-typed cell.  Reproduce that limitation locally so a
    G7 violation (SURVEY §7.4) fails here before it fails in the driver:
    oracled queries must serialize nested outputs (array_join /
    array_to_string) at the boundary."""
    for c in pdf.columns:
        if pdf[c].dtype == object:
            sample = pdf[c].dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (list, np.ndarray, dict)
            ):
                raise AssertionError(
                    f"{side} result column {c!r} holds nested cells — the "
                    "driver's sort_values canonicalizer cannot hash them; "
                    "serialize with array_join (SURVEY §7.4 G7)"
                )


def assert_same_results(spark_df, oracle_con, sql: str, *, float_exact: bool = True):
    """Differential check: Spark DataFrame vs DuckDB SQL result.

    Mirrors the driver's comparison (column names, row count, values after
    column-name sort, order-insensitive) with exact value equality —
    queries are expected to canonicalize floats themselves via round().
    """
    sp_raw = spark_df.toPandas()
    du_raw = oracle_con.execute(sql).df()
    _assert_no_nested_cells(sp_raw, "spark")
    _assert_no_nested_cells(du_raw, "oracle")
    sp = canonicalize(sp_raw)
    du = canonicalize(du_raw)

    assert list(sp.columns) == list(du.columns), (
        f"column mismatch:\n spark={list(sp.columns)}\n duck ={list(du.columns)}"
    )
    assert len(sp) == len(du), f"row count mismatch: spark={len(sp)} duck={len(du)}"

    for c in sp.columns:
        s, d = sp[c], du[c]
        if pd.api.types.is_float_dtype(s) or pd.api.types.is_float_dtype(d):
            s64 = s.astype("float64").to_numpy()
            d64 = d.astype("float64").to_numpy()
            if float_exact:
                ok = (s64 == d64) | (np.isnan(s64) & np.isnan(d64))
            else:
                ok = np.isclose(s64, d64, rtol=0, atol=1e-9, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                raise AssertionError(
                    f"float column {c!r} differs at row {i}: "
                    f"spark={s64[i]!r} duck={d64[i]!r} "
                    f"(query must round() on both sides — SURVEY §7.4 G2)"
                )
        else:
            sk = s.map(_cell_key)
            dk = d.map(_cell_key)
            neq = ~(sk == dk).to_numpy()
            if neq.any():
                i = int(np.argmax(neq))
                raise AssertionError(
                    f"column {c!r} differs at row {i}: spark={s.iloc[i]!r} "
                    f"duck={d.iloc[i]!r}"
                )
