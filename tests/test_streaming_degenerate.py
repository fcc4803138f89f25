"""Empty-feed streaming totality (round 7; the streaming face of the
degenerate-corpus sweep).

A production stream's everyday degenerate input is the EMPTY
micro-batch: a quiet night, a paused producer, a partition with no new
files. Every streaming twin must drain an AvailableNow run over an
empty (schema-only) source to completion with zero output rows and no
crash — watermark init with no max event time, session/window state
machines with nothing to open, dedup with no keys, arbitrary state
with no groups.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from noaa_etl_daily_spark import streaming as st

SRC_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_stream_src(spark, tmp_path_factory):
    """A stream source dir holding ONE schema-bearing, zero-row parquet
    file (readStream needs the schema from somewhere; an empty DIR has
    none — that's the schema-inference face of the no-data day, already
    covered batch-side by the explicit-schema read-backs)."""
    root = tmp_path_factory.mktemp("empty_stream")
    base = pq.read_table(f"{SRC_SF}/events.parquet")
    out = str(root / "events")
    import os

    os.makedirs(out, exist_ok=True)
    pq.write_table(base.schema.empty_table(), f"{out}/part-0.parquet")
    return out


@pytest.mark.parametrize(
    "twin, mode, name",
    [
        (st.stream_tumbling_counts, "complete", "e_tumbling"),
        (st.stream_sliding_counts, "complete", "e_sliding"),
        (st.stream_session_counts, "complete", "e_session"),
        (st.stream_dedup, "append", "e_dedup"),
        (st.stream_user_running_stats, "update", "e_running"),
    ],
)
def test_empty_feed_drains_clean(spark, empty_stream_src, twin, mode, name):
    st.run_to_memory(
        twin(st.read_events_stream(spark, empty_stream_src)), name, mode
    )
    assert spark.sql(f"SELECT * FROM {name}").count() == 0
