"""Task-retry fault injection (VERDICT r7 task 6): prove that Spark
task RETRIES never change answers.

The verification stack already covers data adversaries (hostile
corpus), layout (partition/split invariance), time (timezone sweeps,
micro-batch cuts), and replay (foreachBatch versioned folds). The one
cluster failure mode still testable locally is the most common one of
all: a task dies (executor OOM, preemption, spot reclaim, disk fault)
and the scheduler re-runs it. A retried task re-reads its input split
or re-pulls its shuffle blocks — if any operator is nondeterministic
per attempt (unstable sampling, attempt-dependent state, partial
side effects), the retried run silently diverges. At 1000 executors
retries happen every minute; answers must be attempt-count-invariant.

Mechanism: a subprocess builds its own session with master
``local[8, 4]`` (the second arg = maxFailures, i.e. up to 3 retries —
plain ``local[n]`` never retries, which is why this cannot run on the
shared test session), monkeypatches the engine's table loader to wrap
every source in a ``mapInPandas`` shim that RAISES on every task's
FIRST attempt (``TaskContext.attemptNumber() == 0``), then asserts
each representative query's rows are bit-identical (repr-level) to the
clean un-injected run in the same session. Every scan task failing
once forces retry of the entire scan stage task set; downstream
shuffles consume retried map output. A second axis wraps the FINISHED
plan instead, so first-attempt kills land in the RESULT stage and the
retried task re-pulls its shuffle blocks. A marker file per raise
proves the injection actually fired (dozens of failures per sweep).

Representative set spans the plan classes the verdict names: shuffle
aggregation, multi-distinct expand, broadcast and shuffle joins,
windows, sort/top-k, percentile, MinHash dedup, cosine top-k, KLL and
count-min sketches, a multi-stage TPC-H pipeline, session windows, and
a streaming micro-batch fold (retry inside a micro-batch).

Speculative execution (the OTHER duplicate-attempt mechanism — a
concurrent copy racing a straggler) was attempted and is STRUCTURALLY
untestable on one machine: TaskSchedulerImpl hard-disables speculation
under local[n] masters, and under local-cluster[2,4,2048] (real
executor JVMs, speculation scheduler verified live via its
checkSpeculatableTasks log line) the scheduler refuses to LAUNCH a
speculative copy on the same host as the original attempt
(TaskSetManager's hasAttemptOnHost exclusion) — and every local
executor shares localhost. A straggler shim (7 instant peers, one 4 s
stall, quantile 0.4, multiplier 1.2) marked the task speculatable but
zero speculative attempts ever ran. The retry sweep above covers the
shared property (a second attempt of the same task must produce the
same data); the race-and-commit arbitration is cluster-only.

Live finding (round 8): the sweep caught `agg_kll_quantile_sketch`
diverging under retry — DataSketches KLL compaction consumes random
bits not seeded per task attempt, so a retried task yields a
different (equally valid) sketch. Everything else is bit-identical;
KLL is held to its named bounds instead (exact n, ±3% rank error),
mirroring the partition-invariance whitelist. Operational corollary
for 100 TB: KLL-bearing jobs are correct under retries but not
bytewise reproducible across reruns — pin downstream consumers to the
quantile CONTRACT (rank error), never to sketch bytes.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

# r13: this resilience sweep costs ~2.5 min of the driver-window wall
# and exercises retry/speculation semantics that ordinary query changes
# cannot affect; the seal ritual runs it on every round's final tree
# (SPARK_GRAFT_FULL_SUITE=1). See tests/_sampling.py.
from ._sampling import FULL_SUITE

pytestmark = pytest.mark.skipif(
    not FULL_SUITE,
    reason="fault-injection sweep runs at seal (SPARK_GRAFT_FULL_SUITE=1)",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KEYS = [
    "agg_groupby_multi",        # shuffle agg, map-side combine
    "agg_count_distinct",       # Expand multi-distinct
    "join_inner_equi",          # shuffle join
    "join_broadcast_chain",     # broadcast chain
    "win_topk_per_group",       # partitioned window + filter
    "win_running_sum",          # running frame
    "topk_limit",               # TakeOrderedAndProject
    "agg_percentile",           # exact percentile (sort path)
    "llm_dedup_near_minhash",   # HOF signatures + band self-join
    "llm_sim_topk_cosine",      # broadcast query set + agg
    "agg_countmin_sketch",      # integer sketch cells (hash-determined)
    "pipeline_regional_volume", # 9-stage pipeline
    "evt_session_window",       # session aggregation
    # breadth wave: one per remaining plan class — all bit-equal
    "agg_rollup",               # Expand grouping sets
    "agg_pivot",                # pivot projection
    "join_asof",                # union + per-key window
    "set_except_all",           # multiset anti semantics
    "win_range_frame",          # RANGE frame window
    "evt_tumbling_window",      # event-time bucketing
    "fn_array_higher_order",    # HOF-heavy scan stage
    "llm_dedup_simhash",        # bitwise hamming blocking
    "llm_sim_pq_adc_topk",      # PQ codebook broadcast + ADC ranks
    "agg_theta_sketch_setops",  # theta: k-min-values is a SET property,
                                # so unlike KLL it MUST be bit-equal
    "agg_hll_sketch_merge",     # HLL: bit-equal under RETRY (same merge
                                # tree); NOT under exec-strategy changes
                                # (r9 finding — named bounds in
                                # test_physical_strategy_invariance.py)
]

SCRIPT = r'''
import glob, os, sys, uuid
sys.path.insert(0, os.environ["FI_REPO"])
marker_dir = os.environ["FI_MARKERS"]
sf_dir = os.environ["FI_SF_DIR"]
keys = os.environ["FI_KEYS"].split(",")

from noaa_etl_daily_spark.session import get_spark
spark = get_spark(app_name="fault-injection", master="local[8, 4]",
                  shuffle_partitions=8)

# import the full registry FIRST so every operator module is loaded and
# its `from ..tables import load` binding exists to be swapped
from noaa_etl_daily_spark.registry import load_all
REG = load_all()

import importlib
_tables_mod = importlib.import_module("noaa_etl_daily_spark.tables")
_orig_load = _tables_mod.load
_known_loads = {_orig_load}

def _set_load(fn):
    """Swap the `load` binding in every package module that holds one
    (operators import it as a module-level name, so patching only the
    tables module would miss them all)."""
    _known_loads.add(fn)
    for name, mod in list(sys.modules.items()):
        if mod is None or not name.startswith("noaa_etl_daily_spark"):
            continue
        if vars(mod).get("load") in _known_loads:
            setattr(mod, "load", fn)

def _fail_first_attempt(df):
    schema = df.schema
    def gen(it):
        from pyspark import TaskContext
        tc = TaskContext.get()
        if tc is not None and tc.attemptNumber() == 0:
            with open(os.path.join(
                    os.environ["FI_MARKERS"], uuid.uuid4().hex), "w"):
                pass
            raise RuntimeError("injected first-attempt task failure")
        yield from it
    return df.mapInPandas(gen, schema)

def _patched_load(spark, sf_dir, table):
    return _fail_first_attempt(_orig_load(spark, sf_dir, table))

def canon(df):
    return sorted(repr(tuple(r)) for r in df.collect())

failures = []
for key in keys:
    _set_load(_orig_load)
    clean = canon(REG[key].builder(spark, sf_dir))
    _set_load(_patched_load)
    try:
        injected = canon(REG[key].builder(spark, sf_dir))
    finally:
        _set_load(_orig_load)
    if clean != injected:
        failures.append(key)
        print(f"DIVERGED {key}: clean={len(clean)} inj={len(injected)}",
              flush=True)
    else:
        print(f"ok {key} rows={len(clean)}", flush=True)

# second axis: kill first attempts in the RESULT stage instead of the
# scan stage — the retried task re-pulls its shuffle blocks / re-reads
# the broadcast, the downstream half of the failure surface (the scan
# shim above only ever kills stage-0 tasks). Pass-through wrapper on
# the FINISHED plan, so the values compared are the query's own.
# agg_kll_quantile_sketch is never in FI_KEYS (it gets its own
# named-bounds block below), so no filter is needed here.
RESULT_KEYS = keys[:8]
for key in RESULT_KEYS:
    clean = canon(REG[key].builder(spark, sf_dir))
    injected = canon(_fail_first_attempt(REG[key].builder(spark, sf_dir)))
    if clean != injected:
        failures.append(key + "@result-stage")
        print(f"DIVERGED {key}@result-stage: "
              f"clean={len(clean)} inj={len(injected)}", flush=True)
    else:
        print(f"ok {key}@result-stage rows={len(clean)}", flush=True)

# KLL sketch: NOT bit-equal under retry, BY CONSTRUCTION — DataSketches
# KLL compaction consumes random bits that are not seeded per task
# attempt, so a retried task produces a different (equally valid)
# sketch. Found live by this sweep (round 8). Same handling as the
# partition-invariance whitelist: the named BOUNDS must hold under
# injected retries — exact n, and each estimated quantile's true rank
# within ±3% of its target (the property test_properties.py asserts on
# the clean path).
import bisect
_set_load(_patched_load)
try:
    kll = REG["agg_kll_quantile_sketch"].builder(spark, sf_dir).collect()[0]
finally:
    _set_load(_orig_load)
vals = sorted(
    r.o_totalprice
    for r in _orig_load(spark, sf_dir, "orders")
    .select("o_totalprice").collect()
)
kll_ok = kll.n == len(vals)
for q, got in ((0.5, kll.p50), (0.9, kll.p90), (0.99, kll.p99)):
    rank = bisect.bisect_left(vals, got) / len(vals)
    kll_ok = kll_ok and abs(rank - q) < 0.03
if kll_ok:
    print("ok agg_kll_quantile_sketch (named bounds under retry)",
          flush=True)
else:
    failures.append("agg_kll_quantile_sketch")
    print(f"DIVERGED agg_kll_quantile_sketch: bounds violated {kll}",
          flush=True)

# HLL sketch: bit-equal under retry IS asserted above (FI_KEYS — the
# merge tree is attempt-independent), but the r9 exec-strategy finding
# (SortAggregate moved an estimate 2000 -> 1999) showed the durable
# contract is the ERROR BOUND, not the estimate value. All three
# nondeterminism axes (layout, retry, exec strategy) therefore carry
# the identical named bound: every merged estimate within +/-5% of the
# exact distinct count, asserted here under injected retries too.
from pyspark.sql import functions as F
_set_load(_patched_load)
try:
    hll_rows = REG["agg_hll_sketch_merge"].builder(spark, sf_dir).collect()
finally:
    _set_load(_orig_load)
exact_parts = {
    r.l_returnflag: r.exact
    for r in _orig_load(spark, sf_dir, "lineitem")
    .groupBy("l_returnflag")
    .agg(F.count_distinct("l_partkey").alias("exact"))
    .collect()
}
hll_ok = len(hll_rows) == len(exact_parts)
for r in hll_rows:
    rel = abs(r.approx_parts - exact_parts[r.l_returnflag]) / exact_parts[
        r.l_returnflag]
    hll_ok = hll_ok and rel <= 0.05
if hll_ok:
    print("ok agg_hll_sketch_merge (named bounds under retry)", flush=True)
else:
    failures.append("agg_hll_sketch_merge@bounds")
    print(f"DIVERGED agg_hll_sketch_merge: +/-5% bound violated", flush=True)

# streaming fold: retry INSIDE a micro-batch (complete-mode tumbling)
from noaa_etl_daily_spark import streaming as st
src = os.path.join(os.environ["FI_STREAM_SRC"])
clean_stream = st.stream_tumbling_counts(st.read_events_stream(spark, src))
q = (clean_stream.writeStream.format("memory").queryName("fi_clean")
     .outputMode("complete").trigger(availableNow=True).start())
q.awaitTermination()
want = sorted(repr(tuple(r))
              for r in spark.sql("select * from fi_clean").collect())
inj_stream = st.stream_tumbling_counts(
    _fail_first_attempt(st.read_events_stream(spark, src)))
q = (inj_stream.writeStream.format("memory").queryName("fi_inj")
     .outputMode("complete").trigger(availableNow=True).start())
q.awaitTermination()
got = sorted(repr(tuple(r))
             for r in spark.sql("select * from fi_inj").collect())
if want != got:
    failures.append("stream_tumbling_counts")
    print(f"DIVERGED stream_tumbling_counts: {len(want)} vs {len(got)}",
          flush=True)
else:
    print(f"ok stream_tumbling_counts rows={len(want)}", flush=True)

# stateful streaming fold: retry inside the micro-batch must not change
# the applyInPandasWithState rate-limit accounting (single-batch drain,
# so the 60s-buffer prune never depends on arrival order here)
def _rlb_final(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    last = {}
    for r in spark.sql(f"select * from {name}").collect():
        if r.user_id not in last or r.n_events > last[r.user_id][0]:
            last[r.user_id] = (r.n_events, r.max_burst_60s, r.over_limit)
    return last

want_rlb = _rlb_final(
    st.stream_rate_limit_stats(st.read_events_stream(spark, src)),
    "fi_rlb_clean")
got_rlb = _rlb_final(
    st.stream_rate_limit_stats(
        _fail_first_attempt(st.read_events_stream(spark, src))),
    "fi_rlb_inj")
if want_rlb != got_rlb:
    failures.append("stream_rate_limit_stats")
    print(f"DIVERGED stream_rate_limit_stats: {len(want_rlb)} vs "
          f"{len(got_rlb)} users", flush=True)
else:
    print(f"ok stream_rate_limit_stats users={len(want_rlb)}", flush=True)

# token-bucket admission fold under retry (same single-batch drain)
def _tb_final(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    last = {}
    for r in spark.sql(f"select * from {name}").collect():
        if r.user_id not in last or r.n_events > last[r.user_id][0]:
            last[r.user_id] = (r.n_events, r.n_admitted, r.n_rejected,
                               r.min_rejected_event_id, r.final_tokens_u)
    return last

want_tb = _tb_final(
    st.stream_token_bucket_admission(st.read_events_stream(spark, src)),
    "fi_tb_clean")
got_tb = _tb_final(
    st.stream_token_bucket_admission(
        _fail_first_attempt(st.read_events_stream(spark, src))),
    "fi_tb_inj")
if want_tb != got_tb:
    failures.append("stream_token_bucket_admission")
    print(f"DIVERGED stream_token_bucket_admission", flush=True)
else:
    print(f"ok stream_token_bucket_admission users={len(want_tb)}",
          flush=True)

n_injected = len(glob.glob(os.path.join(marker_dir, "*")))
print(f"INJECTED_FAILURES={n_injected}", flush=True)
print("RESULT=" + ("FAIL:" + ",".join(failures) if failures else "PASS"),
      flush=True)
spark.stop()
sys.exit(1 if failures else 0)
'''


def test_task_retries_never_change_answers(sf_dir, spark, tmp_path):
    """Drive the whole sweep in one subprocess (its own SparkContext —
    local-mode retries need the ``local[8, 4]`` master, which the shared
    session does not have)."""
    from noaa_etl_daily_spark.operators.scans import _scratch
    from noaa_etl_daily_spark import streaming as st

    stream_src = st.prepare_stream_source(
        spark,
        sf_dir,
        _scratch(
            "stream_src", os.path.basename(sf_dir.rstrip("/")), "events"
        ),
    )
    markers = tmp_path / "markers"
    markers.mkdir()
    env = dict(
        os.environ,
        FI_REPO=REPO,
        FI_MARKERS=str(markers),
        FI_SF_DIR=sf_dir,
        FI_KEYS=",".join(KEYS),
        FI_STREAM_SRC=stream_src,
    )
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"fault-injection sweep failed:\n{tail}\n"
        f"stderr tail:\n{chr(10).join(proc.stderr.splitlines()[-15:])}"
    )
    assert "RESULT=PASS" in proc.stdout, tail
    # the sweep is vacuous unless the shim actually killed first
    # attempts — require a substantial injected-failure count
    n = int(proc.stdout.split("INJECTED_FAILURES=")[1].split()[0])
    assert n >= len(KEYS), f"only {n} injected failures fired"
