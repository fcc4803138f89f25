"""Hostile-fixture VALUE differential: every oracled registry query
must still HASH-MATCH its DuckDB oracle on the poisoned corpus, not
merely execute (test_hostile_inputs.py covers execution).

This is the strongest robustness gate in the repo: it proves the
dirty-data semantics — NULL propagation, undefined-domain rows,
quantization at hostile magnitudes, null-ordering under LIMIT — agree
cross-engine, not just that no stage dies. The round-6 run of this
differential found 42 genuine divergences the no-crash sweep had
certified as safe: 18 ANSI job-killers (G11), three DuckDB-side domain
errors, two brand-new gotcha classes (G14 representation boundaries,
G15 integer-division semantics), a DuckDB ISO-week date_diff drift,
NULL-concat drift, and a dozen float-fold/boundary divergences.

Cost: ~2× the clean oracle suite (it runs Spark AND DuckDB per key on
the sf0.001-sized hostile fixture), so it is gated behind
SPARK_GRAFT_HOSTILE_DIFF=1 — the seal ritual (tools_seal.sh) sets it;
plain `pytest tests/` skips with an explicit reason rather than
silently thinning coverage.
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pandas as pd
import pytest

GATE = os.environ.get("SPARK_GRAFT_HOSTILE_DIFF") == "1"

# The footer-census / file-metadata oracles template
# SPARK_GRAFT_TEST_SF_DIR at ENGINE IMPORT time (operators read it into
# a module constant), so the fixture dir must be pinned and exported
# BEFORE anything imports the engine. That makes this module correct
# only as a DEDICATED pytest invocation (tools_seal.sh step 3) — under
# a full-suite run another module imports the engine first, so the
# gate also requires the constant to still be unlocked.
HOSTILE_ROOT = "/tmp/spark_graft_hostile_seal"
if GATE:
    os.environ["SPARK_GRAFT_TEST_SF_DIR"] = HOSTILE_ROOT

import __spark_entry__ as entry  # noqa: E402
from tests.test_hostile_inputs import (  # noqa: E402
    HOSTILE_ROWS,
    TABLES,
    build_hostile_fixture,
)

_locked = None
if GATE:
    from noaa_etl_daily_spark.operators import analytics as _an

    _locked = _an._ORACLE_SF_DIR

pytestmark = pytest.mark.skipif(
    not GATE or _locked != HOSTILE_ROOT,
    reason=(
        "hostile value differential is a seal-ritual gate: run as a "
        "dedicated `SPARK_GRAFT_HOSTILE_DIFF=1 pytest "
        "tests/test_hostile_oracle.py` invocation (tools_seal.sh); "
        "under a plain suite run the engine's oracle sf-dir constant "
        "is already locked to the clean fixture"
    ),
)

QS = entry.queries()
OSQL = entry.oracle_sql()
ORACLED = sorted(k for k in QS if k in OSQL)


def _norm(v):
    # driver-identical canonicalization (tools_simcheck.py)
    if isinstance(v, (list, np.ndarray)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return pd.Timestamp(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1).map(_norm)
    key = df.map(repr)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)


@pytest.fixture(scope="module")
def hostile_env(tmp_path_factory):
    import duckdb

    os.makedirs(HOSTILE_ROOT, exist_ok=True)
    root = build_hostile_fixture(HOSTILE_ROOT)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{root}/{t}.parquet')"
        )
    yield root, con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_hostile_value_differential(spark, hostile_env, name):
    root, con = hostile_env
    # oracle_sql() may template on SPARK_GRAFT_TEST_SF_DIR at call time
    sql = entry.oracle_sql()[name]
    sp = QS[name](spark, root).toPandas()
    du = con.execute(sql).df()
    assert len(sp) == len(du), f"rows {len(sp)} vs {len(du)}"
    a, b = _canon(sp), _canon(du)
    assert sorted(a.columns) == sorted(b.columns)
    if len(a):
        neq = (a.map(repr) != b.map(repr)).any(axis=1)
        assert not neq.any(), (
            f"{int(neq.sum())} mismatched rows\n"
            f"spark:\n{a[neq].head(4)}\nduck:\n{b[neq].head(4)}"
        )


def test_hostile_rows_cover_the_adversarial_classes():
    """The poisoned-row inventory must keep covering the classes the
    round-6 differential proved load-bearing; shrinking it would
    silently weaken every test above."""
    docs = HOSTILE_ROWS["documents"]
    assert any(r[1] is None for r in docs)  # NULL text
    assert any(r[1] == "" for r in docs)  # empty text
    emb = HOSTILE_ROWS["embeddings"]
    assert any(all(x == 0.0 for x in r[1]) for r in emb)  # zero norm
    assert any(max(map(abs, r[1])) >= 1e9 for r in emb)  # huge magnitude
    assert any(
        0 < max(map(abs, r[1])) < 1e-6 for r in emb
    )  # quantizes to zero
    li = HOSTILE_ROWS["lineitem"]
    assert any(r[4] < 0 or r[5] < 0 for r in li)  # negative qty/price
    assert any(r[5] >= 1e9 for r in li)  # 2^53-breaking magnitude
    ev = HOSTILE_ROWS["events"]
    props = [r[5] for r in ev]
    assert "{not json" in props and "" in props  # malformed props
    assert None in props  # NULL props
    assert any(r[4] < 0 for r in ev)  # negative value
    assert any(r[2] is None for r in ev)  # NULL user_id (G13 ranks)
    assert any(r[3] is None for r in ev)  # NULL event_type (G13 groups)
    # dimension-side poisoning (round-6 extension): novel grouping
    # strings, NULL names, dangling FKs, extreme prices/balances
    part = HOSTILE_ROWS["part"]
    assert any(r[1] is None for r in part)  # NULL p_name
    assert any(r[5] < 0 for r in part)  # negative retail price
    supp = HOSTILE_ROWS["supplier"]
    assert any(r[1] is None for r in supp)  # NULL s_name
    assert any(r[2] == 99 for r in supp)  # dangling nationkey
