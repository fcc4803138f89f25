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


ALL_KEYS = sorted(REGISTRY)


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
