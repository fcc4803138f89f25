"""Batch ≡ stream equivalence for the §2.9 operators (SURVEY §7.3 Wave 6):
replay the same events through readStream + AvailableNow and require the
sink to agree with the oracled batch twin."""

from __future__ import annotations

import os

import pytest

from noaa_etl_daily_spark.operators.scans import _scratch
from noaa_etl_daily_spark.registry import load_all
from noaa_etl_daily_spark import streaming as st

REGISTRY = load_all()


@pytest.fixture(scope="module")
def stream_src(spark, sf_dir):
    out = _scratch("stream_src", os.path.basename(sf_dir.rstrip("/")), "events")
    return st.prepare_stream_source(spark, sf_dir, out)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _table_rows(spark, name, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in spark.sql(f"SELECT * FROM {name}").collect()
    )


def test_stream_tumbling_equals_batch(spark, sf_dir, stream_src):
    batch = REGISTRY["evt_tumbling_window"].builder(spark, sf_dir)
    st.run_to_memory(
        st.stream_tumbling_counts(st.read_events_stream(spark, stream_src)),
        "t_tumbling",
        "complete",
    )
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _table_rows(spark, "t_tumbling", cols) == _rows(batch, cols)


def test_stream_session_equals_batch(spark, sf_dir, stream_src):
    batch = REGISTRY["evt_session_window"].builder(spark, sf_dir)
    st.run_to_memory(
        st.stream_session_counts(st.read_events_stream(spark, stream_src)),
        "t_session",
        "complete",
    )
    cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    assert _table_rows(spark, "t_session", cols) == _rows(batch, cols)


def test_stream_dedup_matches_batch_keys(spark, sf_dir, stream_src):
    """Within-watermark dedup keeps the first *arrival* per key (racy
    across parallel file reads), so equivalence is on the deduped KEY
    set, which must match the batch keep-first exactly."""
    batch = REGISTRY["evt_dedup_stream"].builder(spark, sf_dir)
    st.run_to_memory(
        st.stream_dedup(st.read_events_stream(spark, stream_src)),
        "t_dedup",
        "append",
    )
    stream_keys = {
        (r.user_id, r.event_type, r.ts.replace(second=0, microsecond=0))
        for r in spark.sql("SELECT * FROM t_dedup").collect()
    }
    batch_keys = {
        (r.user_id, r.event_type, r.ts.replace(second=0, microsecond=0))
        for r in batch.collect()
    }
    assert stream_keys == batch_keys


def test_stream_stateful_running_stats(spark, sf_dir, stream_src):
    """applyInPandasWithState per-user running totals: after draining the
    finite stream, the latest state per user equals the batch groupBy."""
    from pyspark.sql import functions as F

    from noaa_etl_daily_spark.tables import load

    st.run_to_memory(
        st.stream_user_running_stats(st.read_events_stream(spark, stream_src)),
        "t_stateful",
        "update",
    )
    # update mode may emit once per micro-batch; keep the last (= max
    # n_events) emission per user
    emitted = {}
    for r in spark.sql("SELECT * FROM t_stateful").collect():
        if r.user_id not in emitted or r.n_events > emitted[r.user_id][0]:
            emitted[r.user_id] = (r.n_events, r.total_value)
    batch = {
        r.user_id: (r.n, r.tv)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("tv"),
        )
        .collect()
    }
    assert set(emitted) == set(batch)
    for uid, (n, tv) in batch.items():
        assert emitted[uid][0] == n
        assert abs(emitted[uid][1] - tv) < 1e-6
