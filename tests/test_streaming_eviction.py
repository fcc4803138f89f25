"""WAVE11 candidate 4: stream-state eviction equivalence.

The two registered stream keys hold per-user state under NoTimeout —
correct for finite replay, unbounded on a 24/7 stream. The production
form arms EventTimeTimeout timers: the rate-limit processor PRUNES an
idle user's event buffer once the watermark passes their last buffered
event + 60 s, and the token bucket NORMALIZES its clock pair to the
fresh-init sentinel once the watermark proves the bucket refilled to
capacity. The invariant that makes eviction legal is exactly what these
tests assert: eviction only ever drops state that can no longer change
the answer, so the availableNow result must be IDENTICAL to the
NoTimeout form — and the marker-file probes prove the timers actually
fired (an equivalence with zero evictions would be vacuous)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from noaa_etl_daily_spark import streaming as st

pytestmark = pytest.mark.usefixtures("spark")

_SEQ = [0]


def _drain(spark, df, agg_fn):
    _SEQ[0] += 1
    name = f"evict_eq_{_SEQ[0]}"
    st.run_to_memory(df, name, "update")
    out = agg_fn(spark.table(name)).toPandas()
    spark.catalog.dropTempView(name)
    return out.sort_values(out.columns.tolist()).reset_index(drop=True)


def _rlb_agg(emitted):
    from pyspark.sql import functions as F

    return emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("max_burst_60s", "n_events").alias("max_burst_60s"),
        F.max_by("over_limit", "n_events").alias("over_limit"),
    )


def _tb_agg(emitted):
    from pyspark.sql import functions as F

    return emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("n_admitted", "n_events").alias("n_admitted"),
        F.max_by("n_rejected", "n_events").alias("n_rejected"),
        F.max_by("min_rejected_event_id", "n_events").alias(
            "min_rejected_event_id"
        ),
        F.max_by("final_tokens_u", "n_events").alias("final_tokens_u"),
    )


def _src(spark, sf_dir):
    from noaa_etl_daily_spark.operators.scans import _scratch, _sf_tag

    # the registered keys' own 3-file time-ordered layout (cache-shared)
    src = _scratch("stream_rlb", _sf_tag(sf_dir), "events")
    st.prepare_stream_source_timeordered(spark, sf_dir, src, n_files=3)
    return src


def test_rate_limit_eviction_answer_identical(spark, sf_dir, tmp_path):
    src = _src(spark, sf_dir)
    probe = tmp_path / "rlb_evict"
    probe.mkdir()
    base = _drain(
        spark,
        st.stream_rate_limit_stats(
            st.read_events_stream(spark, src, max_files_per_trigger=1)
        ),
        _rlb_agg,
    )
    evic = _drain(
        spark,
        st.stream_rate_limit_stats(
            st.read_events_stream(spark, src, max_files_per_trigger=1),
            evict=True,
            evict_log_dir=str(probe),
        ),
        _rlb_agg,
    )
    pd.testing.assert_frame_equal(base, evic)
    assert os.listdir(probe), (
        "no buffer eviction fired: the equivalence run was vacuous"
    )


def test_token_bucket_eviction_answer_identical(spark, sf_dir, tmp_path):
    src = _src(spark, sf_dir)
    probe = tmp_path / "tb_evict"
    probe.mkdir()
    base = _drain(
        spark,
        st.stream_token_bucket_admission(
            st.read_events_stream(spark, src, max_files_per_trigger=1)
        ),
        _tb_agg,
    )
    evic = _drain(
        spark,
        st.stream_token_bucket_admission(
            st.read_events_stream(spark, src, max_files_per_trigger=1),
            evict=True,
            evict_log_dir=str(probe),
        ),
        _tb_agg,
    )
    pd.testing.assert_frame_equal(base, evic)
    assert os.listdir(probe), (
        "no bucket normalization fired: the equivalence run was vacuous"
    )


def test_evict_watermark_drops_behind_watermark_rows_hence_not_registered(
    spark, tmp_path
):
    """The measured reason the REGISTERED stream keys stay NoTimeout
    (WAVE12 c3 reversed at seal r11 stage 4): arming EventTimeTimeout
    requires a watermark, and the stateful operator's late-row filter
    then drops rows at-or-behind the CURRENT watermark before the
    processor. The watermark starts at epoch 0, so the classic
    epoch-zero default poison (a 1970-01-01 timestamp — exactly the
    hostile corpus's failing row) is late FROM THE FIRST BATCH and the
    batch oracle's count can never match. NULL-ts rows, measured, are
    NOT late-filtered (they survive both forms) — the loss class is
    behind-watermark timestamps specifically. This test pins the
    mechanism on a tiny synthetic feed: an epoch-zero row per user in
    the first batch, normal 2024 traffic after; the evict form loses
    exactly the epoch rows. The production reading: eviction is for
    feeds with upstream plausibility bounds (bound_event_time) where
    epoch-default/far-future rows are quarantined before the stateful
    stage — with bounds applied, the clean-fixture equivalence above
    is the behavior contract."""
    import pandas as pd

    sf = tmp_path / "sf"
    sf.mkdir()
    rows = []
    for i in range(4):  # one epoch-zero default row per user
        rows.append(
            {
                "event_id": 100 + i,
                "ts": pd.Timestamp("1970-01-01"),
                "user_id": i,
                "etype": "view",
                "value": 1.0,
                "payload": "{}",
            }
        )
    for i in range(40):
        rows.append(
            {
                "event_id": i,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=3 * i),
                "user_id": i % 4,
                "etype": "view",
                "value": 1.0,
                "payload": "{}",
            }
        )
    pd.DataFrame(rows).to_parquet(sf / "events.parquet")
    src = str(tmp_path / "feed")
    st.prepare_stream_source_timeordered(spark, str(sf), src, n_files=3)

    base = _drain(
        spark,
        st.stream_rate_limit_stats(
            st.read_events_stream(spark, src, max_files_per_trigger=1)
        ),
        _rlb_agg,
    )
    evic = _drain(
        spark,
        st.stream_rate_limit_stats(
            st.read_events_stream(spark, src, max_files_per_trigger=1),
            evict=True,
        ),
        _rlb_agg,
    )
    assert base["n_events"].sum() == 44, base
    # the watermark path loses the epoch-zero rows — the two forms
    # MUST disagree here; if Spark's late filter semantics ever
    # change, this flips and the registered keys can revisit the flip
    assert evic["n_events"].sum() < base["n_events"].sum(), (
        "evict form kept behind-watermark rows: the NoTimeout-on-"
        "purpose decision for the registered keys should be revisited"
    )
