"""Property checks for non-oracled (rows-only) operators — the driver only
checks these run; we hold them to real invariants here (SURVEY §7.4 G5)."""

from __future__ import annotations

from noaa_etl_daily_spark.registry import load_all

REGISTRY = load_all()


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    rows = REGISTRY["agg_approx_count_distinct"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_parts > 0
        rel_err = abs(r.approx_parts - r.exact_parts) / r.exact_parts
        assert rel_err < 0.05, f"{r.l_returnflag}: {r.approx_parts} vs {r.exact_parts}"


def test_idempotent_overwrite_is_idempotent(spark, sf_dir):
    """Running the partition re-load twice must not change counts."""
    q = REGISTRY["sink_idempotent_overwrite"].builder
    first = {r.o_orderstatus: r.n_orders for r in q(spark, sf_dir).collect()}
    second = {r.o_orderstatus: r.n_orders for r in q(spark, sf_dir).collect()}
    assert first == second
    source = (
        REGISTRY["scan_csv_schema"].builder(spark, sf_dir).collect()
    )  # orders per status from the csv round-trip
    assert {r.o_orderstatus: r.n_orders for r in source} == first
