"""Hostile-fixture streaming equivalence: the §2.9 stream twins must
still agree with their (hostile-differential-certified) batch twins
when the replayed feed carries adversarial rows — tied timestamps,
negative values, epoch-boundary and far-future event times, malformed
props, single-event users.

Two regimes, matching production reality:

- COMPLETE-mode twins (tumbling / sliding / session): the watermark
  never evicts state in complete mode, so stream ≡ batch must hold
  bit-for-bit even with a 2030 poison row in the feed.
- APPEND-mode twins (within-watermark dedup): a future-dated row
  advances the watermark past all legitimate traffic and silently
  drops it (SURVEY §7.4 G12) — equivalence is only restorable behind
  the ingest plausibility guard, so the test routes BOTH sides through
  the same bounds (``bound_event_time`` on the stream, the identical
  filter on batch) and requires exact key-set equality. This is the
  documented production recipe, exercised on poisoned data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from noaa_etl_daily_spark import streaming as st
from noaa_etl_daily_spark.operators.scans import _scratch
from noaa_etl_daily_spark.registry import load_all
from tests.test_hostile_inputs import HOSTILE_ROWS, build_hostile_fixture

REGISTRY = load_all()

# covers the legitimate fixture span; the 1970 epoch row and the 2030
# future row fall outside — exactly what an ingest guard would bound
BOUNDS = ("2024-01-01 00:00:00", "2024-02-01 00:00:00")


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    return build_hostile_fixture(str(tmp_path_factory.mktemp("hostile_sf")))


@pytest.fixture(scope="module")
def stream_src(spark, hostile_dir):
    # prepare_stream_source is idempotent per out_dir — key the dir on
    # the poison inventory so editing HOSTILE_ROWS can never replay a
    # stale cached source
    import hashlib

    tag = hashlib.md5(
        repr(sorted(HOSTILE_ROWS["events"])).encode()
    ).hexdigest()[:10]
    out = _scratch("stream_src", f"hostile_{tag}", "events")
    return st.prepare_stream_source(spark, hostile_dir, out)


def _rows(df, cols):
    # key=repr: NULL group keys (hostile NULL user/event_type rows)
    # make plain tuple sorting raise None-vs-str TypeErrors
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


def _table_rows(spark, name, cols):
    return sorted(
        (
            tuple(r[c] for c in cols)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        ),
        key=repr,
    )


def test_hostile_stream_tumbling_equals_batch(spark, hostile_dir, stream_src):
    batch = REGISTRY["evt_tumbling_window"].builder(spark, hostile_dir)
    st.run_to_memory(
        st.stream_tumbling_counts(st.read_events_stream(spark, stream_src)),
        "h_tumbling",
        "complete",
    )
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _table_rows(spark, "h_tumbling", cols) == _rows(batch, cols)


def test_hostile_stream_sliding_equals_batch(spark, hostile_dir, stream_src):
    """Includes the negative-sum windows the hostile credit rows
    create: the integer half-up average must floor identically in the
    micro-batch fold and the batch plan (G15)."""
    batch = REGISTRY["evt_sliding_window"].builder(spark, hostile_dir)
    st.run_to_memory(
        st.stream_sliding_counts(st.read_events_stream(spark, stream_src)),
        "h_sliding",
        "complete",
    )
    cols = ["window_start", "event_type", "n_events", "avg_value"]
    assert _table_rows(spark, "h_sliding", cols) == _rows(batch, cols)


def test_hostile_stream_session_equals_batch(spark, hostile_dir, stream_src):
    batch = REGISTRY["evt_session_window"].builder(spark, hostile_dir)
    st.run_to_memory(
        st.stream_session_counts(st.read_events_stream(spark, stream_src)),
        "h_session",
        "complete",
    )
    cols = [
        "user_id", "session_start", "session_end", "n_events", "total_value",
    ]
    assert _table_rows(spark, "h_session", cols) == _rows(batch, cols)


def test_hostile_stream_dedup_guarded_matches_batch(
    spark, hostile_dir, stream_src
):
    """Append-mode dedup behind the G12 ingest guard: the 2030 poison
    row would otherwise advance the watermark past the whole corpus
    and silently drop it. Both sides apply the SAME bounds; the
    deduped key set must then match the batch keep-first exactly."""
    lo, hi = BOUNDS
    batch = (
        REGISTRY["evt_dedup_stream"]
        .builder(spark, hostile_dir)
        .filter(
            (F.col("ts") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("ts") <= F.lit(hi).cast("timestamp_ntz"))
        )
    )
    guarded = st.bound_event_time(
        st.read_events_stream(spark, stream_src), lo, hi
    )
    st.run_to_memory(st.stream_dedup(guarded), "h_dedup", "append")
    stream_keys = {
        (r.user_id, r.event_type, r.ts.replace(second=0, microsecond=0))
        for r in spark.sql("SELECT * FROM h_dedup").collect()
    }
    batch_keys = {
        (r.user_id, r.event_type, r.ts.replace(second=0, microsecond=0))
        for r in batch.collect()
    }
    assert stream_keys == batch_keys
