"""Physical-strategy invariance (round 9; SURVEY §5.3 layer 16).

Two runtime knobs a 1000-executor cluster moves WITHOUT changing the
logical plan, value-compared here so the answers provably cannot move
with them:

1. **Join strategy.** AQE re-plans joins at runtime from observed
   sizes: a join that broadcast on yesterday's corpus sort-merges on
   today's bigger one, and `preferSortMergeJoin` flips shuffle-hash vs
   sort-merge cluster-wide. Every join's ANSWER must be identical
   under (a) the session default (broadcast allowed, AQE's choice),
   (b) broadcasts disabled + sort-merge preferred, and (c) broadcasts
   disabled + shuffle-hash preferred — on the clean fixture AND the
   hostile corpus (dangling FKs, NULL keys: exactly where outer/anti
   join strategy implementations differ).

2. **Arrow batch size.** Pandas-UDF / applyInPandas / mapInPandas /
   mapInArrow operators receive their partitions as a SEQUENCE of
   Arrow batches whose cut depends on `maxRecordsPerBatch` (and, at
   scale, on upstream partition sizes — local tests see one cozy
   batch, production sees thousands). Any per-batch logic that should
   be per-partition or per-group (state reset per batch, aggregation
   closed per batch) silently corrupts results only at scale. Every
   Arrow-path key must return bit-identical answers at batch sizes
   10000 (default), 113, and 7.

3. **Python UDF serialization path.** `pythonUDF.arrow.enabled` swaps
   pickle row transport for Arrow columnar transport under row-at-a-
   time UDFs — a type-coercion minefield (dates, decimals, NaN) that
   must be value-invisible.

4. **Parquet/ORC reader path.** The vectorized ColumnarBatch reader
   and the row-based parquet-mr/ORC fallback are two complete decode
   implementations (timestamps, nested arrays, NULL bitmaps); Spark
   silently drops to the row path for schemas the vectorized reader
   can't handle (and `nanosAsLong` + array<float> embeddings are
   exactly the exotic corners here). Representative keys per decoded
   type family must be bit-equal with all vectorized readers off.

5. **Aggregate exec path.** One logical aggregate has three physical
   executors: HashAggregate, ObjectHashAggregate (collect_/percentile
   buffers), and SortAggregate — Spark picks by buffer type and can
   FALL BACK to sort-based mid-job under memory pressure
   (`useObjectHashAggregateExec=false` and `replaceHashWithSortAgg=
   true` force the fallback paths deterministically). Aggregation
   answers must not depend on which executor ran.

All confs are runtime-settable and restored after each run, so the
shared session is never left dirty.
"""

from __future__ import annotations

import pytest

from noaa_etl_daily_spark.registry import load_all

from .conftest import SF_DIR
from .test_hostile_inputs import build_hostile_fixture

from ._sampling import default_sample

REGISTRY = load_all()

#: Join-bearing keys, one per join shape the registry exercises.
#: Hinted joins (broadcast_chain, shuffle_hash_hint) stay pinned by
#: their hints — included to prove the hint survives hostile confs.
JOIN_KEYS = [
    "join_inner_equi",
    "join_left_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_theta_range",
    "join_asof",
    "join_broadcast_chain",
    "join_bucketed_colocated",
    "join_skew_salted",
    "join_null_safe_eq",
    "join_shuffle_hash_hint",
    "join_bloom_prefilter",
    "join_fallback_lookup_chain",
    "join_scd2_temporal",
    "pipeline_regional_volume",
    "pipeline_market_share",
    "llm_dedup_near_minhash",
    "pipeline_multimodal_curation",
    "pipeline_incremental_curation",
    # round-11 shapes: tombstone anti join and the IVM delta fold
    "scan_merge_on_read_delete_sim",
    "pipeline_cdc_apply",
]

#: NULL-key / dangling-FK semantics differ most across join strategy
#: IMPLEMENTATIONS (broadcast-null-aware vs shuffle variants), so the
#: hostile corpus runs the subset where those paths diverge.
JOIN_KEYS_HOSTILE = [
    "join_inner_equi",
    "join_left_outer",
    "join_full_outer",
    "join_left_anti",
    "join_null_safe_eq",
]

_JOIN_MODES = {
    "default": {},
    "smj": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "true",
    },
    "shj": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "false",
    },
}

#: Every registry key whose plan crosses the Arrow boundary
#: (applyInPandas / mapInPandas / pandas_udf / mapInArrow / cogroup).
#: Kept in sync by test_arrow_key_list_is_complete below.
ARROW_KEYS = [
    "scan_parquet_footer_census",
    "llm_multimodal_image_tiles",
    "evt_stateful_custom",
    "llm_multimodal_frame_sample",
    "llm_multimodal_decode_features",
    "llm_embed_pca_project",
    "llm_sim_topk_cosine_local_prune",
    "udf_pandas_scalar",
    "udaf_pandas_grouped",
    "udtf_map_in_pandas",
    "udtf_cogrouped_pandas",
    "udtf_python_native",
    "udtf_map_in_arrow",
    "udf_pandas_iter",
    "udf_arrow_optimized",
    "udtf_table_argument",
    # round-10 stream-executing keys: their builders drain an
    # applyInPandasWithState query, so the Arrow batch cut lands inside
    # the state fold — exactly what the dedicated chunk-size tests in
    # test_streaming_batchcut_invariance.py prove invariant; swept here
    # too so the registry-wide axis stays closed
    "evt_rate_limit_burst_stream",
    "evt_token_bucket_admission_stream",
    # WAVE18: the evicting production variant — same whole-key-batch
    # accumulation contract as the NoTimeout sibling
    "evt_rate_limit_stream_evicting",
    # WAVE16 stream-executing key: drains the applyInPandasWithState
    # band-flag fold — the fold accumulates the whole key-batch before
    # deciding first-arrival (Arrow chunks inside a micro-batch are not
    # ordered), so the flag rows must be chunk-size-invariant
    "evt_neardup_ingest_stream",
    # WAVE13/14 row-group censuses: distributed footer harvests via
    # mapInPandas (metadata tails only) — batch size must not move a
    # census whose unit is the row group, not the Arrow batch
    "scan_row_group_skipping_census",
    "scan_zorder_rg_skipping_census",
    # WAVE16 compaction-clustering census: same distributed footer
    # harvest (helper-mediated mapInPandas, metadata tails only)
    "sink_compaction_sorted_census",
]

_BATCH_SIZES = ("113", "7")  # compared against the session default


def _canon(df):
    return sorted(repr(tuple(r)) for r in df.collect())


def _run_with_confs(spark, name, sf, confs):
    prior = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        return _canon(REGISTRY[name].builder(spark, sf))
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    return build_hostile_fixture(str(tmp_path_factory.mktemp("ps_hostile")))


def test_arrow_key_list_is_complete():
    """Closure guard (same discipline as the layout whitelists): a new
    Arrow-path registration must enter this sweep or fail the suite."""
    import inspect

    markers = (
        "applyInPandas",
        "mapInPandas",
        "pandas_udf",
        "mapInArrow",
        "cogroup",
    )
    actual = set()
    for n, q in REGISTRY.items():
        try:
            src = inspect.getsource(q.builder)
        except (OSError, TypeError):
            continue
        if any(m in src for m in markers):
            actual.add(n)
    actual.discard("udf_python_scalar")  # row-at-a-time by design
    assert actual == set(ARROW_KEYS), (
        f"Arrow sweep drift: missing={sorted(actual - set(ARROW_KEYS))} "
        f"stale={sorted(set(ARROW_KEYS) - actual)}"
    )


@pytest.mark.parametrize("name", default_sample(JOIN_KEYS, 2, salt="ps"))
def test_join_strategy_invariance_clean(spark, name):
    results = {
        mode: _run_with_confs(spark, name, SF_DIR, confs)
        for mode, confs in _JOIN_MODES.items()
    }
    assert results["default"] == results["smj"] == results["shj"], (
        f"{name}: answer moved with the join strategy "
        f"(default {len(results['default'])} rows, "
        f"smj {len(results['smj'])}, shj {len(results['shj'])})"
    )
    assert len(results["default"]) > 0


@pytest.mark.parametrize("name", default_sample(JOIN_KEYS_HOSTILE, 2, salt="ps"))
def test_join_strategy_invariance_hostile(spark, hostile_dir, name):
    results = {
        mode: _run_with_confs(spark, name, hostile_dir, confs)
        for mode, confs in _JOIN_MODES.items()
    }
    assert results["default"] == results["smj"] == results["shj"], (
        f"{name}: join strategies disagree on the hostile corpus"
    )


@pytest.mark.parametrize("name", default_sample(ARROW_KEYS, 2, salt="ps"))
def test_arrow_batch_size_invariance(spark, name):
    base = _run_with_confs(spark, name, SF_DIR, {})
    assert len(base) > 0
    for size in _BATCH_SIZES:
        got = _run_with_confs(
            spark,
            name,
            SF_DIR,
            {"spark.sql.execution.arrow.maxRecordsPerBatch": size},
        )
        assert got == base, (
            f"{name}: answer moved with Arrow batch size {size} — "
            "per-batch logic where per-group/per-partition was meant"
        )


#: One key per decoded-type family crossing the parquet/ORC readers:
#: full-width lineitem (doubles/strings/dates), events nanos-as-long
#: timestamps, documents long strings, embeddings array<float> (the
#: NESTED vectorized reader), JSON-bearing text, ORC round-trip, and
#: schema-evolution merged footers.
READER_KEYS = [
    "scan_parquet",
    "evt_tumbling_window",
    "llm_text_tokenize_counts",
    "llm_sim_topk_cosine",
    "fn_variant_json",
    "scan_orc_roundtrip",
    "scan_merge_schema_evolution",
    "agg_stats",
]

_ROW_READER = {
    "spark.sql.parquet.enableVectorizedReader": "false",
    "spark.sql.parquet.enableNestedColumnVectorizedReader": "false",
    "spark.sql.orc.enableVectorizedReader": "false",
    "spark.sql.inMemoryColumnarStorage.enableVectorizedReader": "false",
}

#: Aggregation keys spanning the three exec strategies' buffer types:
#: primitive hash buffers, object buffers (collect_list / percentile /
#: mode / weighted-median), and grouping-set expansions.
AGG_EXEC_KEYS = [
    "agg_global",
    "agg_groupby_multi",
    "agg_count_distinct",
    "agg_rollup",
    "agg_percentile",
    "agg_collect_sorted",
    "agg_mode_deterministic",
    "agg_weighted_median",
    "agg_skew_kurtosis",
]

_AGG_MODES = {
    "no_objecthash": {
        "spark.sql.execution.useObjectHashAggregateExec": "false",
    },
    "sort_agg": {
        "spark.sql.execution.replaceHashWithSortAgg": "true",
    },
}


@pytest.mark.parametrize("name", default_sample(READER_KEYS, 2, salt="ps"))
def test_reader_path_invariance(spark, name):
    vectorized = _run_with_confs(spark, name, SF_DIR, {})
    rowbased = _run_with_confs(spark, name, SF_DIR, _ROW_READER)
    assert vectorized == rowbased, (
        f"{name}: vectorized and row-based readers decode differently"
    )
    assert len(vectorized) > 0


@pytest.mark.parametrize("name", default_sample(AGG_EXEC_KEYS, 2, salt="ps"))
def test_aggregate_exec_path_invariance(spark, name):
    base = _run_with_confs(spark, name, SF_DIR, {})
    assert len(base) > 0
    for mode, confs in _AGG_MODES.items():
        got = _run_with_confs(spark, name, SF_DIR, confs)
        assert got == base, (
            f"{name}: answer moved under {mode} aggregate execution"
        )


def test_hll_named_bounds_hold_under_sort_aggregate(spark):
    """LIVE FINDING (round 9): DataSketches HLL union estimates are
    NOT bit-deterministic across aggregate exec strategies — with
    ObjectHashAggregate disabled, SortAggregate merges the monthly
    partials in a different order and agg_hll_sketch_merge's 'R'
    estimate moved 2000 → 1999 (0.05%). Layout and task-retry sweeps
    never moved this merge topology; the exec-strategy axis does.
    Same handling as KLL-under-retry: the named BOUND (±5% of the
    exact distinct count, the contract test_properties.py asserts on
    the clean path) must hold under BOTH fallback exec modes, and the
    operational rule stands — pin consumers to the sketch's error
    contract, never to exact estimate values across physical
    re-planning."""
    from pyspark.sql import functions as F

    from noaa_etl_daily_spark.tables import load

    exact = {
        r.l_returnflag: r.exact
        for r in load(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("exact"))
        .collect()
    }
    for mode, confs in _AGG_MODES.items():
        prior = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            got = {
                r.l_returnflag: r.approx_parts
                for r in REGISTRY["agg_hll_sketch_merge"]
                .builder(spark, SF_DIR)
                .collect()
            }
        finally:
            for k, v in prior.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        assert set(got) == set(exact)
        for flag, est in got.items():
            rel = abs(est - exact[flag]) / exact[flag]
            assert rel < 0.05, (
                f"{mode} {flag}: hll={est} exact={exact[flag]} rel={rel:.3f}"
            )


@pytest.mark.parametrize("mode", sorted(_AGG_MODES))
def test_sketch_named_bounds_hold_under_agg_exec_modes(spark, mode):
    """The other three named-bounds sketches (KLL, GK percentile,
    Misra-Gries frequent items) under the fallback aggregate exec
    strategies: like HLL, their merge trees move with the executor, so
    bit-equality is not the contract — the NAMED BOUNDS are, re-
    asserted here on the exec-strategy axis exactly as
    tests/test_partition_invariance.py asserts them on the layout
    axis."""
    import bisect

    from pyspark.sql import functions as F

    from noaa_etl_daily_spark.tables import load

    confs = _AGG_MODES[mode]
    prior = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)

        # KLL: exact n, each estimated quantile within ±3% true rank
        row = REGISTRY["agg_kll_quantile_sketch"].builder(
            spark, SF_DIR
        ).collect()[0]
        vals = sorted(
            r.o_totalprice
            for r in load(spark, SF_DIR, "orders")
            .select("o_totalprice")
            .collect()
        )
        assert row.n == len(vals)
        for q, got in ((0.5, row.p50), (0.9, row.p90), (0.99, row.p99)):
            rank = bisect.bisect_left(vals, got) / len(vals)
            assert abs(rank - q) < 0.03, f"{mode} q={q}: rank {rank:.4f}"

        # GK: each row carries its exact twin; 1% relative bound
        rows = REGISTRY["agg_approx_quantile"].builder(
            spark, SF_DIR
        ).collect()
        assert len(rows) >= 9
        for r in rows:
            assert abs(r.approx_val - r.exact_val) / r.exact_val < 0.01, (
                f"{mode} {r.l_returnflag} p{r.p}: "
                f"{r.approx_val} vs {r.exact_val}"
            )

        # Misra-Gries: no-false-negative superset guarantee
        sketched = {
            r.frequent_combo
            for r in REGISTRY["agg_freq_items"].builder(
                spark, SF_DIR
            ).collect()
        }
        li = load(spark, SF_DIR, "lineitem")
        total = li.count()
        truly = {
            r.combo
            for r in li.select(
                F.concat_ws(
                    "|", "l_returnflag", "l_linestatus"
                ).alias("combo")
            )
            .groupBy("combo")
            .count()
            .where(F.col("count") >= 0.1 * total)
            .collect()
        }
        assert truly and truly <= sketched, (
            f"{mode} missing: {truly - sketched}"
        )
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_python_udf_arrow_transport_invariance(spark):
    """udf_python_scalar under pickle vs Arrow row transport."""
    base = _run_with_confs(spark, "udf_python_scalar", SF_DIR, {})
    arrow = _run_with_confs(
        spark,
        "udf_python_scalar",
        SF_DIR,
        {"spark.sql.execution.pythonUDF.arrow.enabled": "true"},
    )
    pickle = _run_with_confs(
        spark,
        "udf_python_scalar",
        SF_DIR,
        {"spark.sql.execution.pythonUDF.arrow.enabled": "false"},
    )
    assert base == arrow == pickle
    assert len(base) > 0


OFFHEAP_KEYS = [
    "agg_groupby_multi",
    "agg_count_distinct",
    "agg_percentile",
    "join_inner_equi",
    "join_broadcast_chain",
    "win_topk_per_group",
    "win_range_frame",
    "fn_array_higher_order",
    "fn_hash",
    "llm_dedup_near_minhash",
    "udaf_pandas_grouped",
    "pipeline_regional_volume",
]

_OFFHEAP_SCRIPT = r"""
import sys, datetime
import duckdb
import numpy as np
import pandas as pd
sys.path.insert(0, %(repo)r)
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.memory.offHeap.enabled", "true")
    .config("spark.memory.offHeap.size", "512m")
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


def test_queries_hold_under_offheap_memory():
    """Off-heap Tungsten mode (spark.memory.offHeap.*) swaps the memory
    backing for unsafe rows, hash maps, and sort buffers — the standard
    production configuration for large executors (GC pressure), and a
    STATIC conf, hence a subprocess session. Twelve representatives
    across agg/join/window/HOF/hash/pandas-UDF/pipeline plans must
    still hash-match their DuckDB oracles with all operator memory
    off-heap."""
    import os as _os
    import subprocess as _sp
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    script = _OFFHEAP_SCRIPT % {
        "repo": repo,
        "sf": SF_DIR,
        "keys": OFFHEAP_KEYS,
    }
    proc = _sp.run(
        [_sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo,
    )
    assert proc.returncode == 0, (
        f"off-heap memory mode broke queries:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
