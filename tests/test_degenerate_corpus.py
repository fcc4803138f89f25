"""Degenerate-corpus totality sweep (round 7; SURVEY §5.3 layer 9).

At 100 TB the EMPTY relation is not an edge case — it is the everyday
output of a selective filter, a partition-pruned scan, a day with no
events, or a tenant with no documents. Every executor sees empty
partitions constantly, and any operator whose driver program indexes
into a collected result (``collect()[0]``), fits a codebook over zero
vectors, or divides by a zero count will kill the whole job. The
single-row corpus is the next rung: no pairs exist for any self-join,
every variance is NULL, every window has one frame.

This module materializes both corpora with the EXACT arrow schemas of
the shipped fixtures (schema drift would invalidate the sweep) and
executes every registered query against each via the noop sink — full
materialization, so Catalyst cannot prune a crashing expression
(SURVEY §7.4 G16). The assertion is totality: the plan builds, runs,
and yields a finite (>= 0) row count with the query's own schema. The
value semantics on non-degenerate data stay pinned by the oracle
differentials; this layer pins the *domain boundary*.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from noaa_etl_daily_spark.registry import load_all

REGISTRY = load_all()

SRC_SF = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _build(root: str, n_rows: int | None) -> str:
    """Write each table with its original arrow schema and the first
    ``n_rows`` rows (None → 0 rows). One parquet file per table, same
    physical layout as the shipped fixtures, so file-grain queries
    (footer census, _metadata, binaryFile) see the layout they were
    written for."""
    import pyarrow.parquet as pq

    for t in TABLES:
        base = pq.read_table(f"{SRC_SF}/{t}.parquet")
        out = base.schema.empty_table() if not n_rows else base.slice(0, n_rows)
        pq.write_table(out, f"{root}/{t}.parquet", compression="snappy")
    return root


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    return _build(str(tmp_path_factory.mktemp("empty_sf")), None)


@pytest.fixture(scope="module")
def onerow_dir(tmp_path_factory):
    return _build(str(tmp_path_factory.mktemp("onerow_sf")), 1)


from ._sampling import default_sample

# r13: default run = deterministic 1-in-8 subset; the seal runs all
# keys (SPARK_GRAFT_FULL_SUITE=1) - see tests/_sampling.py.
ALL_KEYS = default_sample(sorted(REGISTRY), 8)


@pytest.mark.parametrize("name", ALL_KEYS)
def test_empty_corpus_total(spark, empty_dir, name):
    """Every registered query must execute to completion over an
    all-empty corpus and produce a well-formed (usually empty, for
    global aggregates often 1-row) result."""
    df = REGISTRY[name].builder(spark, empty_dir)
    df.write.format("noop").mode("overwrite").save()
    assert df.count() >= 0


@pytest.mark.parametrize("name", ALL_KEYS)
def test_onerow_corpus_total(spark, onerow_dir, name):
    """Every registered query must survive the 1-row-per-table corpus:
    no self-join pairs, NULL sample variances, single-frame windows,
    dangling FKs (row 1 of each table need not join to row 1 of
    another)."""
    df = REGISTRY[name].builder(spark, onerow_dir)
    df.write.format("noop").mode("overwrite").save()
    assert df.count() >= 0


def test_cached_marker_staleness_rule(tmp_path):
    """G19 executable: a scratch layout is valid ONLY while its sealed
    _SRC_FP sidecar fingerprint equals the source parquet's current
    (size, mtime_ns) — an ephemeral fixture that reuses a basename must
    invalidate the cache, a missing marker/sidecar/source never
    validates, and (the coarse-mtime hole the fingerprint closes) a
    SAME-TICK rewrite that changes the size also invalidates."""
    import os

    from noaa_etl_daily_spark.operators.scans import _cached, _seal_cache

    sf = tmp_path / "sf"
    out = tmp_path / "out"
    sf.mkdir()
    out.mkdir()
    src = sf / "events.parquet"
    marker = out / "_SUCCESS"

    assert not _cached(str(out), str(sf), "events")  # nothing exists
    src.write_bytes(b"v1")
    assert not _cached(str(out), str(sf), "events")  # no marker yet
    marker.touch()
    assert not _cached(str(out), str(sf), "events")  # marker but no seal
    _seal_cache(str(out), str(sf), "events")
    assert _cached(str(out), str(sf), "events")      # sealed: valid
    src.write_bytes(b"v2-longer")                    # fixture rewritten
    assert not _cached(str(out), str(sf), "events")  # stale: rewrite
    _seal_cache(str(out), str(sf), "events")
    assert _cached(str(out), str(sf), "events")      # re-sealed: valid
    # same-tick same-size rewrite: force identical coarse mtime but a
    # different mtime_ns — the ns-resolution fingerprint must catch it
    st = os.stat(src)
    src.write_bytes(b"v3-longer!")
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    assert not _cached(str(out), str(sf), "events")
    src.unlink()                                     # source vanished
    assert not _cached(str(out), str(sf), "events")


def test_cached_params_token_staleness(tmp_path):
    """The fingerprint keys on the WRITE parameters too: a layout
    sealed by one preparer (or one n_files) must read stale to a
    caller with a different params token — two preparers pointed at
    the same out_dir can never validate each other's file count or
    ordering (round-8 advice)."""
    from noaa_etl_daily_spark.operators.scans import _cached, _seal_cache

    sf = tmp_path / "sf"
    out = tmp_path / "out"
    sf.mkdir()
    out.mkdir()
    (sf / "events.parquet").write_bytes(b"v1")
    (out / "_SUCCESS").touch()
    _seal_cache(str(out), str(sf), "events", params="prepA:n_files=8")
    assert _cached(str(out), str(sf), "events", params="prepA:n_files=8")
    assert not _cached(str(out), str(sf), "events", params="prepA:n_files=6")
    assert not _cached(str(out), str(sf), "events", params="prepB:n_files=8")
    assert not _cached(str(out), str(sf), "events")  # token-less caller


def test_src_fp_rejects_directory_fixture(tmp_path):
    """A directory's size/mtime does not reflect an in-place rewrite of
    a file inside it, so fingerprinting a non-regular fixture path must
    raise instead of silently validating a stale cache."""
    import pytest as _pytest

    from noaa_etl_daily_spark.operators.scans import _src_fp

    sf = tmp_path / "sf"
    (sf / "events.parquet").mkdir(parents=True)  # directory, not a file
    with _pytest.raises(ValueError, match="not a regular file"):
        _src_fp(str(sf), "events")


def test_timeordered_preparer_null_and_empty_ts(spark, tmp_path):
    """prepare_stream_source_timeordered must keep NULL-ts rows (routed
    into the last batch) so it never silently diverges from
    prepare_stream_source on the same fixture, and must degenerate to
    a single all-rows batch on an empty/all-NULL-ts fixture instead of
    crashing on bounds.lo is None (round-8 advice)."""
    import pandas as pd

    from noaa_etl_daily_spark import streaming as st

    base = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sf = tmp_path / "sf"
    sf.mkdir()

    # fixture with 3 NULL-ts rows appended
    withnull = base.limit(40).unionByName(
        base.limit(3).withColumn("ts", F.lit(None).cast(base.schema["ts"].dataType))
    )
    pd_df = withnull.toPandas()
    pd_df.to_parquet(str(sf / "events.parquet"))
    out = st.prepare_stream_source_timeordered(
        spark, str(sf), str(tmp_path / "out_null"), n_files=4
    )
    got = spark.read.parquet(out)
    assert got.count() == 43
    assert got.where(F.col("ts").isNull()).count() == 3

    # all-NULL-ts fixture: single batch, every row kept
    pd_all = pd_df.copy()
    pd_all["ts"] = pd.NaT
    sf2 = tmp_path / "sf2"
    sf2.mkdir()
    pd_all.to_parquet(str(sf2 / "events.parquet"))
    out2 = st.prepare_stream_source_timeordered(
        spark, str(sf2), str(tmp_path / "out_allnull"), n_files=4
    )
    import glob as _glob
    import os as _os

    assert spark.read.parquet(out2).count() == len(pd_all)
    assert len(_glob.glob(_os.path.join(out2, "batch*.parquet"))) == 1
