"""Layout-operator plan + property assertions: bucketed joins must be
shuffle-free, approx quantiles must be within tolerance."""

from __future__ import annotations

from noaa_etl_daily_spark.registry import load_all

REGISTRY = load_all()


def test_bucketed_join_has_no_shuffle_below_join(spark, sf_dir):
    """The whole point of bucketing: the sort-merge join consumes bucket
    files directly — no Exchange on either join input. At fixture scale
    AQE prefers broadcasting the tiny orders side (also shuffle-free,
    but not what we're proving), so auto-broadcast is disabled for this
    check — the 100 TB regime where both sides are too big to
    broadcast."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["join_bucketed_colocated"].builder(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # keep only AQE's final plan — the appended "Initial Plan" section
    # repeats the pre-adaptive operators and would false-positive the
    # Exchange scan below
    plan = plan.split("== Initial Plan ==")[0]
    join_pos = plan.find("SortMergeJoin")
    assert join_pos != -1, f"expected a sort-merge join:\n{plan}"
    below_join = plan[join_pos:]
    # below the join, the bucketed scans feed it directly — the string
    # "Exchange" must not appear (BroadcastExchange included), and both
    # scans must report Bucketed: true
    assert "Exchange" not in below_join, (
        f"bucketed join still shuffles:\n{plan}"
    )
    assert below_join.count("Bucketed: true") == 2, plan


def test_approx_quantile_within_tolerance(spark, sf_dir):
    rows = REGISTRY["agg_approx_quantile"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for approx, exact in zip(r.approx_pcts, r.exact_pcts):
            assert exact > 0
            assert abs(approx - exact) / exact < 0.01, (
                f"{r.l_returnflag}: approx={approx} exact={exact}"
            )


def test_python_datasource_writer_roundtrip(spark, sf_dir):
    """Pure-Python sink (Spark 4 DataSourceWriter): per-partition jsonl
    files + a two-phase commit marker; rows must round-trip exactly."""
    import json
    import os
    import shutil

    from noaa_etl_daily_spark.operators.scans import _scratch, _sf_tag
    from noaa_etl_daily_spark.sources import register_sources
    from noaa_etl_daily_spark.tables import load

    register_sources(spark)
    out = _scratch("pyds_sink", _sf_tag(sf_dir), "nation")
    shutil.rmtree(out, ignore_errors=True)

    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.write.format("jsonl_sink").option("path", out).mode(
        "overwrite"
    ).save()

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    got = []
    for fn in sorted(os.listdir(out)):
        if fn.endswith(".jsonl"):
            with open(os.path.join(out, fn)) as f:
                got += [json.loads(line) for line in f]
    want = [r.asDict() for r in nation.collect()]
    key = lambda d: d["n_nationkey"]  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
    # commit marker records the total row count
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.read()) == len(want)


def test_partitioned_sink_read_prunes_partitions(spark, sf_dir):
    """Reading one l_returnflag from the partitioned sink must plan a
    partition-pruned scan (the 100 TB contract: a day-keyed reader
    touches one day's directories, not the whole table)."""
    from noaa_etl_daily_spark.operators.scans import _scratch, _sf_tag

    REGISTRY["sink_parquet_partitioned"].builder(spark, sf_dir).collect()
    out = _scratch("parquet_part", _sf_tag(sf_dir), "lineitem")
    df = spark.read.parquet(out).where("l_returnflag = 'R'")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], f"no partition pruning in plan:\n{plan}"
    # pruned read must equal a filtered full read
    full = spark.read.parquet(out).collect()
    assert len(df.collect()) == sum(
        1 for r in full if r.l_returnflag == "R"
    )


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """The date-partitioned fact scan must carry a runtime
    dynamicpruningexpression in its PartitionFilters — i.e. the join
    to the filtered date dim prunes fact partitions at execution time,
    not just statically."""
    df = REGISTRY["join_partition_pruned_dynamic"].builder(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "dynamicpruningexpression" in plan.lower(), plan
    # and the pruning actually reaches the fact scan's partition filters
    lower = plan.lower()
    pf = lower.find("partitionfilters")
    assert pf != -1 and "dynamicpruning" in lower[pf : pf + 400], plan


def test_range_sorted_layout_files_are_disjoint_and_ordered(spark, sf_dir):
    """sink_range_sorted_layout must produce files whose ts ranges are
    pairwise disjoint (range partitioning) and whose row groups are
    internally non-decreasing (sortWithinPartitions) — the two
    properties parquet min/max skipping needs."""
    import glob
    import os

    import pyarrow.parquet as pq

    from noaa_etl_daily_spark.operators.scale_ops import (
        sink_range_sorted_layout,
    )
    from noaa_etl_daily_spark.operators.scans import SCRATCH

    sink_range_sorted_layout(spark, sf_dir).count()  # materialize the write
    tag = os.path.basename(sf_dir.rstrip("/"))
    files = sorted(
        glob.glob(os.path.join(SCRATCH, "range_sorted", tag, "events", "*.parquet"))
    )
    assert len(files) > 1
    spans = []
    for path in files:
        pf = pq.ParquetFile(path)
        idx = pf.schema_arrow.names.index("ts")
        mins, maxs = [], []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        assert mins == sorted(mins), f"{path} row groups out of order"
        spans.append((min(mins), max(maxs)))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo, "file time ranges overlap — range partitioning broken"


def test_embed_cosine_blocked_plan_has_no_nested_loop(spark, sf_dir):
    """The round-2 verdict flagged the embed-cosine dedup's O(n²)
    non-equi self-join (BroadcastNestedLoopJoin). The reworked primary
    must plan ONLY equi-joins: candidates from the (table_id, bucket)
    join, vector fetches on vec_id. Locks the fix against regression."""
    df = REGISTRY["llm_dedup_embed_cosine"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lateness_accounting_window_is_partitioned(spark, sf_dir):
    """The round-2 verdict flagged the lateness diagnostic's global
    (single-partition) running-max window. The sharded rework must
    partition the window on the ingest-shard key — no empty
    partition-spec Window anywhere in the executed plan."""
    df = REGISTRY["evt_lateness_accounting"].builder(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    windows = [line for line in plan.splitlines() if "Window [" in line]
    assert windows, plan
    for line in windows:
        # node renders as: Window [funcs], [partition cols], [ordering] —
        # a global window has an EMPTY partition list `], [], [`; the
        # shard expression surfaces as an internal _wN alias, so assert
        # non-emptiness of the partition spec rather than a column name
        assert "], [], [" not in line, f"unpartitioned window:\n{line}"


def test_entry_surfaces_uncertified_queries_first():
    """The driver samples ~50 queries per round in queries() iteration
    order, so __spark_entry__ orders never-certified keys first (the
    SURVEY §2 priority head leading). Locks that contract: every key
    that already has a CORRECTNESS row from a prior round must sort
    after every key that has none."""
    import __spark_entry__ as e

    q = list(e.queries())
    certified = e._certified()
    assert certified, "expected prior-round CORRECTNESS files in the repo"
    uncert = [n for n in q if n not in certified]
    # all uncertified keys come first, as one contiguous prefix
    assert q[: len(uncert)] == uncert
    # the SURVEY §2 never-certified inventory keys lead the prefix
    prio_live = [n for n in e._PRIORITY if n not in certified]
    assert q[: len(prio_live)] == prio_live


def test_static_partition_pruning_reaches_scan(spark, sf_dir):
    """The literal partition-column filter must surface as a
    PartitionFilters entry on the pruned layout's scan (and NOT as a
    post-scan Filter over all partitions)."""
    df = REGISTRY["scan_partition_pruned_static"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        line for line in plan.splitlines() if "FileScan parquet" in line
    )
    assert "PartitionFilters: [" in scan, scan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", scan).group(1)
    assert "l_returnflag" in pf and "R" in pf, scan
