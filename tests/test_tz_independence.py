"""Host-timezone independence (round 7; deployment hazard class).

The driver contract hands us ITS SparkSession; `configure_session()`
pins `spark.sql.session.timeZone=UTC` at query-build time, and every
fixture timestamp is NTZ — so results must be identical on a host
whose JVM and libc default to any timezone. This module proves it the
blunt way: a SUBPROCESS with `TZ=America/New_York` (DST-observing,
negative offset) and `-Duser.timezone=America/New_York`, running the
driver-sim oracle diff over the most time-sensitive oracled keys.
DuckDB runs in the same subprocess under the same TZ, so the check
covers both engines' host-TZ surface end to end.

Key selection: every oracled key whose builder source mentions an
event-time/date construct family (window/date_trunc/dayofweek/
hour/to_date/timestamp casts) would be ~200 keys; the subprocess pays
a JVM start per run, so this sweep takes the ~20 highest-leverage
representatives across the construct families. The full registry's
time semantics stay pinned by the main oracle suite (UTC host) — this
layer pins the DELTA: host-TZ sensitivity of the constructs
themselves.

Non-vacuousness (probed live): with the session timeZone deliberately
un-pinned to America/New_York, evt_tumbling_window's buckets shift by
the EST offset (window_start 2024-01-01 19:00:00 vs the oracle's
00:00:00) — the sweep fails loudly the moment the UTC pin in
configure_session() stops reaching a driver-built session.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: One representative per time-construct family (see module docstring).
TZ_KEYS = [
    "evt_tumbling_window",      # window() bucketing
    "evt_sliding_window",       # overlapping windows
    "evt_session_window",       # gap sessionization
    "evt_watermark_late",       # watermark arithmetic
    "fn_date_parts",            # year/month/day/dow extraction
    "fn_date_trunc_diff",       # date_trunc + datediff
    "fn_datetime_format_patterns",  # format/parse round-trips
    "fn_timezone_convert",      # explicit from_utc_timestamp paths
    "fn_interval_arithmetic",   # interval add/subtract
    "evt_calendar_dim_join",    # generated calendar dim
    "evt_business_days_sla",    # weekday arithmetic
    "evt_dow_hour_heatmap",     # dayofweek x hour grid
    "evt_seasonal_decompose",   # epoch-day dow discipline (G4)
    "win_year_over_year",       # add_months self-join
    "pipeline_daily_kpis",      # to_date day grain
    "scan_json_lines",          # timestamp-bearing text round-trip
    "scan_csv_schema",          # timestampNTZFormat write/read
    "join_asof",                # time-ordered as-of matching
    "evt_inter_arrival_stats",  # epoch-microsecond deltas
    "agg_cramers_v",            # dayofweek grouping
]

_SCRIPT = r"""
import sys, datetime
import duckdb
import numpy as np
import pandas as pd
sys.path.insert(0, %(repo)r)
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.driver.extraJavaOptions", "-Duser.timezone=America/New_York")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
qs, osql = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('%(sf)s/{t}.parquet')"
    )

def norm(v):
    if isinstance(v, (list, np.ndarray)):
        return tuple(norm(x) for x in v)
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return pd.Timestamp(v)
    if isinstance(v, float):
        return round(v, 9)
    return v

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1).map(norm)
    key = df.map(repr)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)

bad = []
for name in %(keys)r:
    sp = canon(qs[name](spark, %(sf)r).toPandas())
    du = canon(con.execute(osql[name]).df())
    ok = sp.shape == du.shape and bool(
        (sp.map(repr).values == du.map(repr).values).all()
    )
    print(name, "match:", ok, flush=True)
    if not ok:
        bad.append(name)
spark.stop()
sys.exit(1 if bad else 0)
"""


def test_time_queries_hold_under_non_utc_host(sf_dir):
    env = dict(os.environ, TZ="America/New_York")
    script = _SCRIPT % {"repo": REPO, "sf": sf_dir, "keys": TZ_KEYS}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"non-UTC host broke time queries:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-2000:]}"
    )


_STREAM_SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from noaa_etl_daily_spark.session import configure_session
from noaa_etl_daily_spark.registry import load_all
from noaa_etl_daily_spark import streaming as st
from noaa_etl_daily_spark.operators.scans import _scratch
import os

spark = configure_session(
    SparkSession.builder.master("local[8]")
    .config("spark.driver.extraJavaOptions",
            "-Duser.timezone=America/New_York")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
sf = %(sf)r
src = st.prepare_stream_source(
    spark, sf, _scratch("stream_src_tz", os.path.basename(sf.rstrip("/")),
                        "events"))
q = (
    st.stream_tumbling_counts(st.read_events_stream(spark, src))
    .writeStream.format("memory").queryName("tz_stream")
    .outputMode("complete").trigger(availableNow=True).start()
)
q.awaitTermination()
got = sorted(
    map(repr, ((r.window_start, r.event_type, r.n_events, r.total_value)
               for r in spark.sql("select * from tz_stream").collect()))
)
batch = load_all()["evt_tumbling_window"].builder(spark, sf)
want = sorted(
    map(repr, ((r.window_start, r.event_type, r.n_events, r.total_value)
               for r in batch.collect()))
)
print("stream rows:", len(got), "batch rows:", len(want), flush=True)
sys.exit(0 if got == want and got else 1)
"""


def test_streaming_windows_hold_under_non_utc_host(sf_dir):
    """The streaming face of the TZ layer: window()/watermark bucketing
    inside a STREAMING query runs through the same session-timeZone
    code paths, but at micro-batch planning time — prove the UTC pin in
    configure_session reaches them too, by draining the tumbling twin
    on an America/New_York host and requiring bit-equality with the
    batch twin in the same subprocess."""
    env = dict(os.environ, TZ="America/New_York")
    script = _STREAM_SCRIPT % {"repo": REPO, "sf": sf_dir}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"non-UTC host broke streaming windows:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )


_LOCALE_SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.driver.extraJavaOptions",
            "-Duser.language=tr -Duser.country=TR")
    .getOrCreate()
)
row = spark.sql(
    "SELECT upper('istanbul i') u, lower('ISTANBUL I') l, "
    "initcap('istanbul city') ic, format_number(1234567.891, 2) fn, "
    "date_format(timestamp'2024-03-05 10:00:00', 'MMM EEEE') df, "
    "format_string('%%,d', 1234567) fs"
).collect()[0]
got = tuple(row)
want = ("ISTANBUL I", "istanbul i", "Istanbul City", "1,234,567.89",
        "Mar Tuesday", "1,234,567")
print("got:", got, flush=True)
spark.stop()
sys.exit(0 if got == want else 1)
"""


def test_string_and_format_functions_hold_under_turkish_locale():
    """Host-LOCALE independence, the sibling hazard to host TZ: the
    Turkish dotted/dotless-I case mapping and ',' vs '.' digit
    grouping are the classic ways a JVM default locale corrupts
    results on a heterogeneously-provisioned cluster. Probed live
    (round 9): Spark 4 pins upper/lower/initcap to the Unicode
    (UTF8_BINARY) mapping, date_format month/day names and
    format_number/format_string grouping to a fixed locale — so under
    -Duser.language=tr + LC_ALL=tr_TR.UTF-8 the six canary
    expressions must equal their English/Unicode forms exactly. If an
    engine upgrade ever reintroduces default-locale sensitivity, this
    fails before any query does."""
    env = dict(
        os.environ, LANG="tr_TR.UTF-8", LC_ALL="tr_TR.UTF-8"
    )
    script = _LOCALE_SCRIPT % {"repo": REPO}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"Turkish-locale host moved string/format results:\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
