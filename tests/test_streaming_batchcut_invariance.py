"""Micro-batch-boundary invariance (VERDICT r7 task 3): the streaming
analogue of tests/test_partition_invariance.py.

A real cluster never controls where the stream is cut into
micro-batches — trigger cadence, source backpressure, and file-arrival
timing all move the boundaries, and every boundary is a watermark
advance, a state checkpoint, and (append mode) a finalization
opportunity. The batch-equivalence suite (tests/test_streaming.py)
proves each twin equals its batch oracle under ONE cut; this sweep
proves the FINAL answer is identical under adversarially different
cuts: ``maxFilesPerTrigger`` ∈ {1, 3, all} over a TIME-ORDERED
6-file source (prepare_stream_source_timeordered), so the 1-file run
takes 6 watermark steps through the corpus while the all-at-once run
takes a single one.

What each mode proves:

- complete-mode windows: state accumulation is fold-order independent
  across batch cuts (integer-cents discipline, same as the batch
  partition-invariance sweep).
- append-mode windows: watermark FINALIZATION is cut-invariant — a
  window emitted after 6 incremental watermark advances carries the
  same values as one finalized in a single drain, and the emitted SET
  is identical (both = windows below the final watermark, which
  depends only on the corpus max event time).
- update-mode arbitrary state (applyInPandasWithState): the last
  emission per key equals the full fold regardless of how many
  micro-batch folds produced it.
- stream-stream join: watermark-bounded join state never evicts a row
  that could still match (10 min watermark > 5 min join range), so the
  matched-pair set is cut-invariant.
- dedup within watermark: the kept KEY set is cut-invariant (which
  arrival wins within a key is racy by contract; the key set is not).
- foreachBatch folds (count-min sketch, keyed upsert table): the
  versioned fold gives the bit-identical standing table whether it was
  built from 1, 3, or 8 micro-batches.
"""

from __future__ import annotations

import os
import shutil

import pytest

from ._sampling import default_sample
from pyspark.sql import functions as F

from noaa_etl_daily_spark.operators.scans import _scratch
from noaa_etl_daily_spark import streaming as st
from noaa_etl_daily_spark.tables import load

CUTS = (1, 3, None)  # maxFilesPerTrigger; None = one drain-everything batch


@pytest.fixture(scope="module")
def ordered_src(spark, sf_dir):
    out = _scratch(
        "stream_src_ordered", os.path.basename(sf_dir.rstrip("/")), "events"
    )
    return st.prepare_stream_source_timeordered(spark, sf_dir, out)


def _drain(spark, df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def _canon(df):
    return sorted(map(tuple, df.collect()))


TWINS = {
    # name: (builder over the streamed events df, output mode)
    "tumbling_complete": (st.stream_tumbling_counts, "complete"),
    "tumbling_append": (st.stream_tumbling_counts, "append"),
    "sliding_complete": (st.stream_sliding_counts, "complete"),
    "sliding_append": (st.stream_sliding_counts, "append"),
    "session_complete": (st.stream_session_counts, "complete"),
    "session_append": (st.stream_session_counts, "append"),
    "ss_join_append": (st.stream_view_purchase_join, "append"),
}


@pytest.mark.parametrize("twin", default_sample(sorted(TWINS), 2, salt="tw"))
def test_batchcut_invariance(spark, ordered_src, twin):
    builder, mode = TWINS[twin]
    results = []
    for cut in CUTS:
        df = _drain(
            spark,
            builder(st.read_events_stream(spark, ordered_src, cut)),
            f"bc_{twin}_{cut}",
            mode,
        )
        results.append(_canon(df))
    assert results[0] == results[1] == results[2], (
        f"{twin}: final answer moved with the micro-batch cut "
        f"(rows {len(results[0])}/{len(results[1])}/{len(results[2])})"
    )
    assert len(results[0]) > 0  # the sweep must exercise real output


def test_batchcut_append_finalizes_exactly_final_watermark(
    spark, sf_dir, ordered_src
):
    """An append-mode tumbling run must emit exactly the windows below
    the final watermark (corpus max ts − 10 min), computed from the
    batch side — pinning WHAT the invariant answer is, not just that
    the sweep's runs agree with each other. Drains its own query (cut
    = 1 file/batch, the maximally incremental case) rather than
    reading a sibling test's memory table, so it passes standalone
    under -k selection, random ordering, or xdist."""
    ev = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    hi = ev.agg(F.max("ts").alias("hi")).collect()[0].hi
    import datetime

    wm = hi - datetime.timedelta(minutes=10)
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("w.end") <= F.lit(wm))
    )
    want = {
        (r["w"].start, r.event_type): r.n_events for r in batch.collect()
    }
    emitted = _drain(
        spark,
        st.stream_tumbling_counts(
            st.read_events_stream(spark, ordered_src, 1)
        ),
        "bc_tumbling_append_final",
        "append",
    )
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in emitted.collect()
    }
    assert got == want


def test_batchcut_dedup_key_set_invariant(spark, ordered_src):
    key_sets = []
    for cut in CUTS:
        df = _drain(
            spark,
            st.stream_dedup(st.read_events_stream(spark, ordered_src, cut)),
            f"bc_dedup_{cut}",
            "append",
        )
        key_sets.append(
            {
                (r.user_id, r.event_type, r.ts.replace(second=0, microsecond=0))
                for r in df.collect()
            }
        )
    assert key_sets[0] == key_sets[1] == key_sets[2]
    assert len(key_sets[0]) > 0


def test_batchcut_stateful_final_state_invariant(spark, ordered_src):
    """applyInPandasWithState: the LAST emission per user (max n_events)
    must be identical whether the fold ran over 6, 2, or 1 batches."""
    finals = []
    for cut in CUTS:
        df = _drain(
            spark,
            st.stream_user_running_stats(
                st.read_events_stream(spark, ordered_src, cut)
            ),
            f"bc_state_{cut}",
            "update",
        )
        last = {}
        for r in df.collect():
            if r.user_id not in last or r.n_events > last[r.user_id][0]:
                last[r.user_id] = (r.n_events, r.total_value)
        finals.append(last)
    assert finals[0] == finals[1] == finals[2]
    assert len(finals[0]) > 0


@pytest.mark.parametrize("fpb", [1, 3, 8])
def test_batchcut_countmin_sketch_bit_identical(
    spark, sf_dir, ordered_src, fpb, tmp_path
):
    """foreachBatch sketch maintenance: the standing count-min table is
    cell-wise identical to the one-shot batch sketch for EVERY batch
    granularity (cell addition commutes; the versioned fold adds each
    batch exactly once)."""
    target = str(tmp_path / f"cm_{fpb}")
    ckpt = str(tmp_path / f"cm_ckpt_{fpb}")
    st.run_streaming_countmin_merge(
        spark, ordered_src, target, ckpt, files_per_batch=fpb
    )
    got = {
        (r.d, r.col): r.cnt for r in spark.read.parquet(target).collect()
    }
    ev = load(spark, sf_dir, "events")
    want = {(r.d, r.col): r.cnt for r in st.countmin_cells(ev).collect()}
    assert got == want


@pytest.mark.parametrize("fpb", [1, 3, 8])
def test_batchcut_upsert_table_invariant(
    spark, sf_dir, ordered_src, fpb, tmp_path
):
    """foreachBatch keyed upsert: the final serving table equals the
    batch groupBy at every batch granularity."""
    target = str(tmp_path / f"up_{fpb}")
    ckpt = str(tmp_path / f"up_ckpt_{fpb}")
    st.run_foreachbatch_upsert(
        spark, ordered_src, target, ckpt, files_per_batch=fpb
    )
    got = {
        r.user_id: (r.n_events, r.value_cents)
        for r in spark.read.parquet(target).collect()
    }
    want = {
        r.user_id: (r.n, r.cents)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("long")
            ).alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_batchcut_neardup_flags_invariant_on_ordered_frontier(
    spark, sf_dir, tmp_path
):
    """Streaming MinHash near-dedup under different micro-batch cuts.

    'First-arrived doc per band bucket' is arrival-order-dependent BY
    DESIGN, so the invariance statement needs the feed shape a real
    crawl frontier has: monotone doc_ids (here: 4 files split by
    doc_id range, mtimes ascending). On that feed the first arrival in
    a bucket is its global-min doc_id under EVERY cut, so the complete
    flag rows — (doc_id, band_id, sig, first_doc_id) — must be
    identical whether the frontier replays 1, 2, or 4 files per
    trigger."""
    import pyspark.sql.functions as F

    from noaa_etl_daily_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    src = str(tmp_path / "docs_ordered")
    os.makedirs(src, exist_ok=True)
    import time as _time

    now = _time.time()
    step = (n + 3) // 4
    for i in range(4):
        part = docs.where(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        )
        tmp = src + f"_t{i}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        pfile = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, f"frontier{i:02d}.parquet")
        shutil.copyfile(os.path.join(tmp, pfile), dst)
        mt = now - 600 + i * 60
        os.utime(dst, (mt, mt))
        shutil.rmtree(tmp)

    schema = docs.schema
    results = []
    for cut in (1, 2, None):
        reader = spark.readStream.schema(schema)
        if cut:
            reader = reader.option("maxFilesPerTrigger", str(cut))
        stream = reader.parquet(src)
        df = _drain(
            spark,
            st.stream_neardup_band_flags(stream),
            f"bc_neardup_{cut}",
            "append",
        )
        results.append(_canon(df))
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0


def test_batchcut_resume_with_changed_cut(spark, ordered_src, tmp_path):
    """Checkpoint resume with a RETUNED micro-batch cut — the real ops
    move (an operator changes maxFilesPerTrigger and restarts the
    query). Phase 1 drains the first half of the ordered feed at
    1 file/trigger into an append-mode parquet sink; phase 2 adds the
    rest and resumes from the SAME checkpoint with no cut (one drain
    batch). Watermark state crosses the restart via the checkpoint, so
    the final emitted window set must equal an uninterrupted reference
    run — finalization must survive both the restart and the cut
    change.

    Staging gotcha, demonstrated live while writing this test: the
    file source orders candidate files by MODIFICATION time, so a copy
    that loses the staged mtimes (plain copyfile) can deliver file 2
    before file 1 — the watermark jumps past file 1's whole range and
    its ~550 windows arrive 'late' (dropped or emitted partial).
    In-order arrival is part of the feed contract the invariance
    statement rests on; copy2 below preserves the mtimes that encode
    it."""
    import glob

    files = sorted(glob.glob(os.path.join(ordered_src, "batch*.parquet")))
    assert len(files) == 6
    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    schema = spark.read.parquet(ordered_src).schema

    def run_phase(cut):
        reader = spark.readStream.schema(schema)
        if cut:
            reader = reader.option("maxFilesPerTrigger", str(cut))
        stream = reader.parquet(str(src)).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        q = (
            st.stream_tumbling_counts(stream)
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for f in files[:3]:
        shutil.copy2(f, src / os.path.basename(f))
    run_phase(1)
    for f in files[3:]:
        shutil.copy2(f, src / os.path.basename(f))
    run_phase(None)  # resume: same checkpoint, different cut

    got = _canon(spark.read.schema(
        "window_start timestamp_ntz, event_type string, "
        "n_events bigint, total_value double"
    ).parquet(str(sink)))
    ref = _canon(
        _drain(
            spark,
            st.stream_tumbling_counts(
                st.read_events_stream(spark, ordered_src, 3)
            ),
            "bc_resume_ref",
            "append",
        )
    )
    assert got == ref
    assert len(got) > 0


def test_arrow_chunk_size_invariant_stateful_fold(spark, ordered_src):
    """The Arrow axis of the stateful twin: applyInPandasWithState
    hands each key's micro-batch rows to the update function as an
    ITERATOR of pandas chunks whose cut follows
    arrow.maxRecordsPerBatch — locally one cozy chunk, at scale
    thousands. A state function that read only the first chunk (or
    reset per chunk instead of per key) would pass every default-conf
    test and corrupt only in production. Final per-user state at
    chunk size 7 must equal the default's."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"

    def final_states(name):
        df = _drain(
            spark,
            st.stream_user_running_stats(
                st.read_events_stream(spark, ordered_src, 2)
            ),
            name,
            "update",
        )
        last = {}
        for r in df.collect():
            if r.user_id not in last or r.n_events > last[r.user_id][0]:
                last[r.user_id] = (r.n_events, r.total_value)
        return last

    base = final_states("bc_arrow_default")
    prior = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")
        tiny = final_states("bc_arrow_tiny")
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    assert base == tiny
    assert len(base) > 0


def test_batchcut_rate_limit_burst_invariant_and_equals_batch(
    spark, sf_dir, ordered_src
):
    """stream_rate_limit_stats: the final per-user (n_events,
    max_burst_60s, over_limit) must be identical under 1/3/all
    files-per-trigger AND bit-equal the batch window form — the
    60s-buffer prune is exact on a time-ordered frontier regardless of
    where the cuts land, and max() folding keeps earlier exact window
    counts through any prune."""
    from noaa_etl_daily_spark.registry import load_all

    finals = []
    for cut in CUTS:
        df = _drain(
            spark,
            st.stream_rate_limit_stats(
                st.read_events_stream(spark, ordered_src, cut)
            ),
            f"bc_rlb_{cut}",
            "update",
        )
        last = {}
        for r in df.collect():
            if r.user_id not in last or r.n_events > last[r.user_id][0]:
                last[r.user_id] = (
                    r.n_events,
                    r.max_burst_60s,
                    r.over_limit,
                )
        finals.append(last)
    assert finals[0] == finals[1] == finals[2]
    assert len(finals[0]) > 0
    batch = {
        r.user_id: (r.n_events, r.max_burst_60s, r.over_limit)
        for r in load_all()["evt_rate_limit_burst"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert finals[0] == batch


def test_arrow_chunk_size_invariant_rate_limit_fold(spark, ordered_src):
    """Arrow axis of the rate-limit fold: chunks inside a key's
    micro-batch are arrow-cut, NOT time-ordered, so a per-chunk
    merge-and-prune would drop lookback context later chunks still
    need — the fold therefore accumulates the whole key-batch before
    its single merge/prune, and the final answer at chunk size 7 must
    equal the default's."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"

    def final_states(name):
        df = _drain(
            spark,
            st.stream_rate_limit_stats(
                st.read_events_stream(spark, ordered_src, 2)
            ),
            name,
            "update",
        )
        last = {}
        for r in df.collect():
            if r.user_id not in last or r.n_events > last[r.user_id][0]:
                last[r.user_id] = (
                    r.n_events, r.max_burst_60s, r.over_limit,
                )
        return last

    base = final_states("bc_arrow_rlb_default")
    prior = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")
        tiny = final_states("bc_arrow_rlb_tiny")
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    assert base == tiny
    assert len(base) > 0


def test_batchcut_token_bucket_invariant_and_equals_batch(
    spark, sf_dir, ordered_src
):
    """stream_token_bucket_admission: final per-user admission ledger
    identical under 1/3/all files-per-trigger AND bit-equal the batch
    ordered fold — refill gaps are reconstructed identically on any
    cut of the time-ordered frontier because every batch is sorted and
    the bucket state carries the last event time across cuts."""
    from noaa_etl_daily_spark.registry import load_all

    cols = (
        "n_events", "n_admitted", "n_rejected",
        "min_rejected_event_id", "final_tokens_u",
    )
    finals = []
    for cut in CUTS:
        df = _drain(
            spark,
            st.stream_token_bucket_admission(
                st.read_events_stream(spark, ordered_src, cut)
            ),
            f"bc_tb_{cut}",
            "update",
        )
        last = {}
        for r in df.collect():
            if r.user_id not in last or r.n_events > last[r.user_id][0]:
                last[r.user_id] = tuple(r[c] for c in cols)
        finals.append(last)
    assert finals[0] == finals[1] == finals[2]
    assert len(finals[0]) > 0
    batch = {
        r.user_id: tuple(r[c] for c in cols)
        for r in load_all()["evt_token_bucket_admission"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert finals[0] == batch


def test_arrow_chunk_size_invariant_token_bucket_fold(spark, ordered_src):
    """Arrow axis of the token-bucket fold (same hazard as the
    rate-limit fold: chunks inside a key's micro-batch are not
    time-ordered, so the fold must accumulate the whole key-batch
    before sorting and replaying the bucket)."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"

    def final_states(name):
        df = _drain(
            spark,
            st.stream_token_bucket_admission(
                st.read_events_stream(spark, ordered_src, 2)
            ),
            name,
            "update",
        )
        last = {}
        for r in df.collect():
            if r.user_id not in last or r.n_events > last[r.user_id][0]:
                last[r.user_id] = (
                    r.n_events, r.n_admitted, r.n_rejected,
                    r.min_rejected_event_id, r.final_tokens_u,
                )
        return last

    base = final_states("bc_arrow_tb_default")
    prior = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")
        tiny = final_states("bc_arrow_tb_tiny")
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    assert base == tiny
    assert len(base) > 0


def test_batchcut_drift_census_fold_invariant_on_ordered_frontier(
    spark, sf_dir, tmp_path
):
    """The streaming drift monitor's fold under different micro-batch
    cuts: on the doc_id-ordered frontier the standing census — and
    therefore the emitted monitor table — must be identical whether
    the feed replays 1, 2, or all files per trigger, and must equal
    the BATCH monitor bit-for-bit (cross-batch exact dedup is the only
    stateful coupling; the prior-passes probe must resolve it
    identically at every cut)."""
    from noaa_etl_daily_spark.operators.scans import _sf_tag
    from noaa_etl_daily_spark.registry import load_all

    registry = load_all()
    src = _scratch("stream_docs_ord", _sf_tag(sf_dir), "documents")
    st.prepare_stream_source_docs_ordered(spark, sf_dir, src, n_files=4)

    results = []
    for cut in (1, 2, None):
        work = str(tmp_path / f"drift_{cut}")
        target = os.path.join(work, "census")
        st.run_drift_monitor_stream(
            spark,
            src,
            target,
            os.path.join(work, "ckpt"),
            files_per_batch=cut or 16,
        )
        results.append(_canon(spark.read.parquet(target)))
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0

    stream_monitor = _canon(
        registry["evt_drift_monitor_stream"].builder(spark, sf_dir)
    )
    batch_monitor = _canon(
        registry["llm_curation_drift_monitor"].builder(spark, sf_dir)
    )
    assert stream_monitor == batch_monitor


def test_batchcut_pack_census_fold_invariant_on_ordered_frontier(
    spark, sf_dir, tmp_path
):
    """The streaming pack fold under different micro-batch cuts: shard
    boundaries depend on the GLOBAL running token total, so the fold's
    derived-offset handshake (standing census → offset → batch prefix
    sum) must put every doc in the same shard whether the frontier
    replays 1, 2, or all files per trigger — and the final census must
    equal the batch packing key bit-for-bit."""
    from noaa_etl_daily_spark.operators.scans import _sf_tag
    from noaa_etl_daily_spark.registry import load_all

    registry = load_all()
    src = _scratch("stream_docs_ord", _sf_tag(sf_dir), "documents")
    st.prepare_stream_source_docs_ordered(spark, sf_dir, src, n_files=4)

    results = []
    for cut in (1, 2, None):
        work = str(tmp_path / f"pack_{cut}")
        target = os.path.join(work, "census")
        st.run_pack_shards_stream(
            spark,
            src,
            target,
            os.path.join(work, "ckpt"),
            files_per_batch=cut or 16,
        )
        results.append(_canon(spark.read.parquet(target)))
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0

    batch_census = _canon(
        registry["llm_pack_token_shards"].builder(spark, sf_dir)
    )
    assert results[0] == batch_census


def test_batchcut_distinct_bitmap_fold_invariant(spark, sf_dir, tmp_path):
    """The exact-distinct bitmap fold is order-free ALGEBRA (bitmap OR
    is commutative and idempotent), so unlike the rank-coupled folds it
    needs no ordered frontier: identical state under every cut of the
    plain time-ordered feed, equal to the batch bitmap rollup of the
    same fixture."""
    from noaa_etl_daily_spark.operators.scans import _sf_tag
    from noaa_etl_daily_spark.tables import load

    src = _scratch("stream_x1", _sf_tag(sf_dir), "events")
    st.prepare_stream_source_timeordered(spark, sf_dir, src, n_files=4)
    results = []
    for cut in (1, 2, None):
        work = str(tmp_path / f"dst_{cut}")
        target = os.path.join(work, "census")
        st.run_distinct_census_stream(
            spark,
            src,
            target,
            os.path.join(work, "ckpt"),
            files_per_batch=cut or 16,
        )
        census = (
            spark.read.parquet(target)
            .groupBy("event_type")
            .agg(F.expr("sum(bitmap_count(bm))").alias("n"))
        )
        results.append(_canon(census))
    assert results[0] == results[1] == results[2]
    batch = _canon(
        load(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
    )
    assert results[0] == batch


def test_batchcut_evicting_rate_limit_invariant(spark, ordered_src, tmp_path):
    """The registered evicting rate limiter under different micro-batch
    cuts: the watermark trajectory differs per cut, but on the bounded
    time-ordered feed no admitted row is ever late and eviction only
    prunes unreachable lookback — identical final answers at 1, 3, and
    drain-everything cuts, equal to the bounded NoTimeout form."""
    from noaa_etl_daily_spark.operators.events_time import (
        _QUAR_HI,
        _QUAR_LO,
    )

    results = []
    for cut in CUTS:
        reader = spark.readStream.schema(
            spark.read.parquet(ordered_src).schema
        )
        if cut:
            reader = reader.option("maxFilesPerTrigger", str(cut))
        stream = st.bound_event_time(
            reader.parquet(ordered_src), _QUAR_LO, _QUAR_HI
        )
        df = _drain(
            spark,
            st.stream_rate_limit_stats(stream, evict=True),
            f"bc_rlb_ev_{cut}",
            "update",
        )
        final = df.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max_by("max_burst_60s", "n_events").alias("max_burst_60s"),
            F.max_by("over_limit", "n_events").alias("over_limit"),
        )
        results.append(_canon(final))
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0

    noevict = st.stream_rate_limit_stats(
        st.bound_event_time(
            spark.readStream.schema(spark.read.parquet(ordered_src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(ordered_src),
            _QUAR_LO,
            _QUAR_HI,
        )
    )
    df = _drain(spark, noevict, "bc_rlb_noev_ref", "update")
    ref = df.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("max_burst_60s", "n_events").alias("max_burst_60s"),
        F.max_by("over_limit", "n_events").alias("over_limit"),
    )
    assert results[0] == _canon(ref)
