"""Structured Streaming twins of the §2.9 event-time operators
(SURVEY.md §2.9 / §7.3 Wave 6).

The driver's oracle can only check batch DataFrames, so the streaming
forms live here and are proven equivalent to their batch twins in
tests/test_streaming.py: replay the same events through
``readStream`` + ``Trigger.AvailableNow`` and assert the sink equals the
batch answer.

Design:

- Sources are directories of parquet (``prepare_stream_source`` fans the
  fixture out); schema is supplied explicitly — streaming scans don't
  infer.
- Aggregation twins run in **complete** output mode for exact batch
  equivalence on finite replay; production append-mode emission is
  governed by ``withWatermark``, which the late-drop twin exercises.
- The stateful twin uses ``transformWithStateInPandas``-style arbitrary
  state via ``applyInPandasWithState`` — per-user running aggregates kept
  in explicit GroupState, the pattern any custom streaming operator
  (funnel, sessionizer, CDC merge) builds on.
- At scale: every twin shuffles on the same keys as its batch form; state
  stores are per-key and bounded (windows expire via watermark, dedup
  state via within-watermark keys).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load


def prepare_stream_source(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_files: int = 8,
    table: str = "events",
) -> str:
    """Fan a fixture table out into a directory of parquet files (the
    shape a streaming file source consumes). Idempotent per out_dir;
    freshness delegates to operators.scans._cached (the one shared
    staleness rule — source-fingerprint sidecar) so a reused out_dir
    never serves a prior fixture's data. The params token folds the
    preparer name and n_files into the fingerprint: the same out_dir
    written by the OTHER preparer, or by this one with a different
    fan-out, must read as stale, not fresh."""
    from .operators.scans import _cached, _seal_cache

    params = f"prepare_stream_source:n_files={n_files}"
    if not _cached(out_dir, sf_dir, table, params):
        (
            load(spark, sf_dir, table)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        _seal_cache(out_dir, sf_dir, table, params)
    return out_dir


def prepare_stream_source_timeordered(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_files: int = 6,
    table: str = "events",
) -> str:
    """Fan the events fixture into ``n_files`` parquet files split by
    EVENT-TIME range, file mtimes ascending in the same order — the
    shape a real ingest feed has (roughly in-order arrival), and the
    one where micro-batch boundaries matter: each batch cut advances
    the watermark past the previous range, so append-mode window
    finalization, state eviction, and within-watermark dedup all
    exercise their cross-batch paths. Used by the batch-cut invariance
    sweep (tests/test_streaming_batchcut_invariance.py) to prove final
    answers do not depend on where Spark cuts the stream into
    micro-batches. Idempotent per out_dir via the shared _cached rule
    (params token = preparer name + n_files, so this layout and
    prepare_stream_source's never validate each other).

    NULL-ts rows: every range predicate evaluates NULL on them, so a
    naive split would silently DROP them while prepare_stream_source
    (a plain repartition) keeps them — the two preparers would diverge
    on a fixture containing NULL event times and a batchcut test
    comparing a streamed fold against the full batch fixture would
    miscount. They are routed into the LAST batch file explicitly. An
    all-NULL or empty fixture (bounds.lo is None) degenerates to a
    single batch file holding every row."""
    import shutil
    import time as _time

    from .operators.scans import _cached, _seal_cache

    params = f"prepare_stream_source_timeordered:n_files={n_files}"
    if _cached(out_dir, sf_dir, table, params):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ev = load(spark, sf_dir, table).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    bounds = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    if bounds.lo is None:
        n_files = 1  # empty / all-NULL ts: one batch with every row
        cuts = []
    else:
        cuts = [
            bounds.lo + (bounds.hi - bounds.lo) * i / n_files
            for i in range(n_files + 1)
        ]
    now = _time.time()
    for i in range(n_files):
        if not cuts:
            cond = F.lit(True)
        else:
            cond = (F.col("ts") >= cuts[i]) & (
                (F.col("ts") < cuts[i + 1])
                if i < n_files - 1
                else (F.col("ts") <= cuts[i + 1])
            )
            if i == n_files - 1:
                cond = cond | F.col("ts").isNull()
        tmp = out_dir + f"_t{i}"
        ev.where(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        dst = os.path.join(out_dir, f"batch{i:02d}.parquet")
        shutil.copyfile(os.path.join(tmp, part), dst)
        # ascending mtimes: the file source lists by modification time,
        # so batches replay in event-time order like a live feed
        mt = now - 600 + i * 60
        os.utime(dst, (mt, mt))
        shutil.rmtree(tmp)
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass
    _seal_cache(out_dir, sf_dir, table, params)
    return out_dir


def read_events_stream(
    spark: SparkSession,
    src_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the prepared events directory.

    Watermarks require TIMESTAMP (with zone), not TIMESTAMP_NTZ — with
    the session pinned to UTC the cast is value-preserving; the twins
    cast their outputs back to NTZ so results compare 1:1 with the batch
    forms. ``max_files_per_trigger`` picks the micro-batch cut (None =
    drain everything in one batch under availableNow) — the knob the
    batch-cut invariance sweep turns."""
    schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.parquet(src_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def bound_event_time(events: DataFrame, lo: str, hi: str) -> DataFrame:
    """Ingest-time event-time plausibility guard: keep only rows with
    ``lo <= ts <= hi``.

    Why this is load-bearing on a real stream: the watermark is driven
    by the MAX event time seen, so a single corrupt future-dated row
    (epoch-in-millis-read-as-seconds, a 2099 default, a fat-fingered
    producer clock) advances the watermark past all legitimate traffic
    and every subsequent in-order event arrives 'late' below the
    watermark — aggregation state is evicted and the data is silently
    dropped. One bad row poisons the whole stream from that point on.
    tests/test_streaming.py::test_stream_watermark_poison_guard
    demonstrates the failure live and proves this guard restores
    batch-equal results. At production scale, route the complement
    (``ts`` outside the bounds) to a quarantine sink instead of
    dropping it on the floor; the guard itself is a scan-stage filter
    with zero state."""
    return events.filter(
        (F.col("ts") >= F.lit(lo).cast("timestamp"))
        & (F.col("ts") <= F.lit(hi).cast("timestamp"))
    )


def stream_tumbling_counts(events: DataFrame) -> DataFrame:
    """Streaming twin of evt_tumbling_window (same plan shape: watermark
    + window aggregation, map-side partial combine before the keyed
    shuffle)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact integer cents, as the batch twin: micro-batch
            # partial-state fold order can never move the total
            (
                F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_sliding_counts(events: DataFrame) -> DataFrame:
    """Streaming twin of evt_sliding_window: 1-hour windows sliding
    every 15 minutes — each event expands into duration/slide = 4 open
    windows of state, all expired by the same watermark."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.floor(
                    (
                        200
                        * F.sum(F.round(F.col("value") * 100).cast("bigint"))
                        + F.count(F.lit(1))
                    )
                    / (2 * F.count(F.lit(1)))
                ).cast("bigint")
                / 10000.0
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def stream_session_counts(events: DataFrame) -> DataFrame:
    """Streaming twin of evt_session_window: native session_window with
    per-user merging state."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0
            ).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("s.start").cast("timestamp_ntz").alias("session_start"),
            F.col("s.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup(events: DataFrame) -> DataFrame:
    """Streaming twin of evt_dedup_stream: dropDuplicatesWithinWatermark
    on the logical event key — state for a key expires once the
    watermark passes its minute bucket, which is what bounds dedup state
    on an unbounded stream."""
    keyed = events.withColumn("minute_bucket", F.date_trunc("minute", "ts"))
    return (
        keyed.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "minute_bucket"])
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
        )
    )


def stream_view_purchase_join(events: DataFrame) -> DataFrame:
    """Stream-stream self-join (twin of join_theta_range): view→purchase
    pairs by the same user within 5 minutes, both sides watermarked so
    the join STATE is bounded — a view older than watermark-10min can
    never match a future purchase (the time-range condition tells Spark
    exactly when to evict it). Without the range bound the state store
    would grow without limit on an unbounded stream; with it, state is
    O(events in the watermark horizon), the only shape that survives an
    always-on 100 TB/day ingest."""
    a = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("user_a"),
            F.col("event_id").alias("first_id"),
            F.col("ts").alias("ts_a"),
        )
        .withWatermark("ts_a", "10 minutes")
    )
    b = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_b"),
            F.col("event_id").alias("second_id"),
            F.col("ts").alias("ts_b"),
        )
        .withWatermark("ts_b", "10 minutes")
    )
    return a.join(
        b,
        (F.col("user_a") == F.col("user_b"))
        & (F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES")),
    ).select(
        "first_id",
        "second_id",
        F.col("user_a").alias("user_id"),
        (F.unix_micros("ts_b") - F.unix_micros("ts_a")).alias("gap_us"),
    )


def stream_user_running_stats(events: DataFrame) -> DataFrame:
    """Arbitrary-stateful streaming operator (twin of the
    evt_stateful_custom pattern): per-user running event count and value
    sum held in explicit GroupState via applyInPandasWithState."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str
) -> None:
    """Drain a finite stream with AvailableNow into an in-memory table."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_enriched_by_static_dim(
    events: DataFrame, user_dim: DataFrame
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch hash-joins
    against the static dimension with NO streaming state at all (the
    dim is re-broadcast per batch) — the canonical shape for decorating
    an event firehose with slowly-changing reference data. Contrast
    with the stream-stream join, which must keep watermark-bounded
    state."""
    enriched = events.join(user_dim, "user_id")
    return enriched.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def stream_user_stats_tws(events: DataFrame) -> DataFrame:
    """Same per-user running aggregate as ``stream_user_running_stats``
    but through Spark 4's ``transformWithStateInPandas`` — the
    successor arbitrary-state API: typed state handles
    (ValueState/ListState/MapState), timers, and TTL replace the single
    opaque GroupState blob. State remains per-key in the state store,
    so scale behavior matches the older API; what changes is that
    custom operators compose from declared state primitives instead of
    hand-packed tuples."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningStats(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def stream_view_purchase_left_join(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream join — the semantics inner joins can't
    give a funnel: views that never converted still emit (with NULL
    purchase columns) once the watermark proves no in-window purchase
    can arrive anymore. Same bounded-state discipline as the inner
    twin: both sides watermarked, the time-range condition sets the
    eviction horizon; the null-emitting side additionally waits for
    the watermark to pass the end of each row's match window before
    declaring it unmatched — which is why rows near the head of an
    in-flight stream are held back, and why the equivalence test only
    compares the watermark-settled region."""
    a = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("user_a"),
            F.col("event_id").alias("first_id"),
            F.col("ts").alias("ts_a"),
        )
        .withWatermark("ts_a", "10 minutes")
    )
    b = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_b"),
            F.col("event_id").alias("second_id"),
            F.col("ts").alias("ts_b"),
        )
        .withWatermark("ts_b", "10 minutes")
    )
    return a.join(
        b,
        (F.col("user_a") == F.col("user_b"))
        & (F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES")),
        "leftOuter",
    ).select(
        "first_id",
        "second_id",
        F.col("user_a").alias("user_id"),
        F.col("ts_a").alias("view_ts"),
    )


def stream_session_finalize_on_timeout(events: DataFrame) -> DataFrame:
    """Timer-driven sessionization with applyInPandasWithState +
    EventTimeTimeout: a user's open session is held in state and
    FINALIZED either (a) immediately, when a later event for the same
    user arrives more than the gap after it — no watermark needed, the
    arrival itself proves the session closed — or (b) by the EVENT-TIME
    TIMER when the watermark passes last_event + gap, which is how an
    always-on pipeline emits the final session of an idle user without
    waiting for them to return. Timers are the piece plain windowed
    aggregation can't express: state that acts on the ABSENCE of input.
    Append-mode output holds exactly the finalized sessions."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    GAP_US = 30 * 60 * 1_000_000
    out_schema = (
        "user_id bigint, session_start_us bigint, n_events bigint"
    )
    state_schema = "start bigint, last bigint, n bigint"

    def fn(key, pdf_iter, state: GroupState):
        def final_row(s, n):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [s],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            s, last, n = state.get
            state.remove()
            yield final_row(s, n)
            return
        ts_all = []
        for pdf in pdf_iter:
            # epoch microseconds, engine-exact integers
            ts_all.extend(
                int(v)
                for v in pdf["ts"].astype("datetime64[us]").astype("int64")
            )
        ts_all.sort()
        if state.exists:
            s, last, n = state.get
        else:
            s, last, n = ts_all[0], ts_all[0], 0
        for t in ts_all:
            if n > 0 and t < s:
                # late arrival older than the open session's start:
                # the session it belonged to was already finalized —
                # folding it in would move `last` backward and
                # double-count; drop it (standard late-data policy)
                continue
            if n > 0 and t - last > GAP_US:
                yield final_row(s, n)
                s, n = t, 0
            n += 1
            # never move `last` backward: a late event inside the open
            # session extends its count, not its idle clock
            last = max(last, t)
        state.update((s, last, n))
        # fire when the watermark passes last + gap (ms for the API);
        # clamp above the current watermark — EventTimeTimeout rejects
        # a timer at-or-before it, which a late-arriving key could
        # otherwise request
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max((last + GAP_US) // 1000, wm_ms + 1))

    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def merge_user_partials(existing: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Merge a micro-batch's per-user partials into the standing state
    table: counts add, last_ts takes the max, value accumulates in
    integer cents (re-mergeable and bit-stable in any order). The merge
    key comparison is NULL-SAFE: groupBy puts all NULL-user rows in ONE
    group, so the table merge must treat NULL as one mergeable key too —
    a plain equi-join would never match NULL against NULL and every
    batch touching a NULL-user event would append a fresh NULL row,
    silently forking the serving table away from the batch answer."""
    part = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_ts"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "value_cents"
        ),
    )
    if existing is None:
        return part
    e, b = existing.alias("e"), part.alias("b")
    zero = F.lit(0).cast("long")
    return e.join(
        b, F.col("e.user_id").eqNullSafe(F.col("b.user_id")), "full_outer"
    ).select(
        F.coalesce("b.user_id", "e.user_id").alias("user_id"),
        (
            F.coalesce("e.n_events", zero) + F.coalesce("b.n_events", zero)
        ).alias("n_events"),
        # greatest() skips NULLs: one-sided rows keep their side's ts
        F.greatest("e.last_ts", "b.last_ts").alias("last_ts"),
        (
            F.coalesce("e.value_cents", zero)
            + F.coalesce("b.value_cents", zero)
        ).alias("value_cents"),
    )


def run_foreachbatch_upsert(
    spark: SparkSession,
    src_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    files_per_batch: int = 2,
) -> int:
    """The foreachBatch operational pattern: continuously fold a stream
    into a keyed serving TABLE on plain parquet (no MERGE-capable
    format needed). Each micro-batch pre-aggregates to per-user
    partials (map-side combine inside the batch), full-outer-merges
    with the standing table on user_id, and rewrites the table — cost
    O(batch + table) per trigger, never a history re-scan; at real
    scale the rewrite narrows to the partitions the batch touched
    (pair with dynamic partition overwrite) and the table side stays
    bucketed on user_id so the merge join never shuffles it.

    Restart semantics: foreachBatch is AT-LEAST-ONCE, so the fold must
    be idempotent under micro-batch replay — handled by the versioned
    fold (``_fold_versioned``): a batch whose merge already committed
    is detected by its version marker and never re-added. Returns the
    number of micro-batches executed."""
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_batch))
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    n_batches = 0

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        _fold_versioned(
            batch_df.sparkSession,
            target_dir,
            batch_id,
            merge_user_partials,
            batch_df,
        )

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


#: marker folded into the injected crash message so the caller can tell
#: the deliberate kill from a real failure surfacing through the same
#: StreamingQueryException channel
_X1_CRASH_MARKER = "injected-sink-crash-marker"


class InjectedSinkCrash(RuntimeError):
    """Deliberate kill AFTER a micro-batch's sink commit but BEFORE
    Structured Streaming commits the batch to its checkpoint — the
    exact at-least-once replay window foreachBatch exposes."""


def run_exactly_once_sink(
    spark: SparkSession,
    src_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    files_per_batch: int = 1,
    crash_on_nth_commit: int | None = None,
) -> list[int]:
    """End-to-end exactly-once foreachBatch sink (WAVE13 candidate 1):
    drain ``src_dir`` through the two-phase versioned fold
    (``_fold_versioned`` + ``merge_user_partials``) into a keyed
    serving table at ``target_dir``, optionally KILLING the query
    right after its ``crash_on_nth_commit``-th sink commit — after the
    version directory sealed its ``_SUCCESS`` but before the
    checkpoint recorded the batch, so a restart from the same
    checkpoint MUST replay that batch. The versioned fold detects the
    replay by its committed version marker and skips the merge, which
    is precisely what turns foreachBatch's at-least-once delivery into
    an exactly-once table. Returns the batch ids whose sink commit ran
    in THIS invocation (the crashed run's list ends at the kill point).

    A real 24/7 ingest deploys exactly this loop: idempotent versioned
    sink + checkpoint restart; at scale the rewrite narrows to touched
    partitions (dynamic partition overwrite) and the version markers
    live in a manifest table instead of _SUCCESS files, but the commit
    protocol — sink-version check, merge-into-new-version, mirror,
    prune — is unchanged."""
    schema = spark.read.parquet(src_dir).schema
    commits: list[int] = []

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _fold_versioned(
            batch_df.sparkSession,
            target_dir,
            batch_id,
            merge_user_partials,
            batch_df,
        )
        commits.append(batch_id)
        if (
            crash_on_nth_commit is not None
            and len(commits) == crash_on_nth_commit
        ):
            raise InjectedSinkCrash(
                f"{_X1_CRASH_MARKER}: killed after sink commit of batch "
                f"{batch_id}, before its checkpoint commit"
            )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_batch))
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    except Exception as ex:  # noqa: BLE001 — re-raised unless ours
        if crash_on_nth_commit is None or _X1_CRASH_MARKER not in str(ex):
            raise
    return commits


def merge_type_partials(existing: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Per-event-type partial merge for ONE day partition of the
    partitioned exactly-once sink: counts add, value accumulates in
    integer cents. Null-safe key merge, same reasoning as
    merge_user_partials (NULL event_type is one group)."""
    part = batch.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "value_cents"
        ),
    )
    if existing is None:
        return part
    e, b = existing.alias("e"), part.alias("b")
    zero = F.lit(0).cast("long")
    return e.join(
        b, F.col("e.event_type").eqNullSafe(F.col("b.event_type")), "full_outer"
    ).select(
        F.coalesce("b.event_type", "e.event_type").alias("event_type"),
        (
            F.coalesce("e.n_events", zero) + F.coalesce("b.n_events", zero)
        ).alias("n_events"),
        (
            F.coalesce("e.value_cents", zero)
            + F.coalesce("b.value_cents", zero)
        ).alias("value_cents"),
    )


def run_exactly_once_sink_partitioned(
    spark: SparkSession,
    src_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    files_per_batch: int = 1,
    crash_in_nth_batch: int | None = None,
) -> list[tuple[int, str]]:
    """Partitioned exactly-once foreachBatch sink — the 'rewrite only
    the touched partitions' production shape the whole-table sink's
    docstring promises: the serving table is laid out as
    ``target/day=D/`` partition directories, and each micro-batch runs
    the versioned fold PER TOUCHED DAY (its version ledger living
    under ``<target>.versions/day=D/`` — outside the table root, so
    partition discovery never sees it). Untouched day partitions are
    never read, merged, or rewritten — per-batch cost is
    O(batch + touched partitions), the claim the layout test pins by
    checksumming untouched partition files across batches.

    The commit granularity is (batch, partition): ``crash_in_nth_batch``
    kills the query after the FIRST day of that batch's fold commits —
    a torn multi-partition batch. On restart the replayed batch skips
    the day that committed (version marker) and folds the rest, which
    is exactly how a partition-grain ledger turns at-least-once
    delivery into exactly-once state, partition by partition. Returns
    this invocation's fold calls as ``(batch_id, day, merged)`` —
    ``merged=False`` marks a replayed fold whose version marker
    short-circuited the merge (only the idempotent mirror reran)."""
    schema = spark.read.parquet(src_dir).schema
    commits: list[tuple[int, str, bool]] = []
    vbase = target_dir + ".versions"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.withColumn("day", F.to_date("ts"))
        # the touched-day list is a bounded driver hop: a micro-batch
        # spans minutes-to-hours of event time — a handful of
        # partitions — never the corpus
        days = sorted(
            str(r.day) for r in b.select("day").distinct().collect()
        )
        first_of_batch = True
        for day in days:
            dslice = b.where(F.col("day").cast("string") == day).drop(
                "day"
            )
            vroot = os.path.join(vbase, f"day={day}")
            merged = batch_id not in _committed_versions(vroot)
            _fold_versioned(
                batch_df.sparkSession,
                os.path.join(target_dir, f"day={day}"),
                batch_id,
                merge_type_partials,
                dslice,
                vroot=vroot,
            )
            commits.append((batch_id, day, merged))
            if (
                crash_in_nth_batch is not None
                and len({c[0] for c in commits}) == crash_in_nth_batch
                and first_of_batch
            ):
                raise InjectedSinkCrash(
                    f"{_X1_CRASH_MARKER}: killed after partition day={day} "
                    f"of batch {batch_id} committed, before the batch's "
                    f"checkpoint commit"
                )
            first_of_batch = False

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_batch))
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    except Exception as ex:  # noqa: BLE001 — re-raised unless ours
        if crash_in_nth_batch is None or _X1_CRASH_MARKER not in str(ex):
            raise
    return commits


def _committed_versions(vroot: str) -> list[int]:
    """Batch ids under ``vroot`` whose parquet write fully committed
    (``_SUCCESS`` marker), ascending. Local-FS listing is fine here; on
    an object store the same check walks the FileSystem API or a
    manifest table."""
    if not os.path.isdir(vroot):
        return []
    out = []
    for d in os.listdir(vroot):
        if d.startswith("v=") and os.path.exists(
            os.path.join(vroot, d, "_SUCCESS")
        ):
            out.append(int(d[2:]))
    return sorted(out)


def _fold_versioned(
    sp: SparkSession,
    target_dir: str,
    batch_id: int,
    merge_fn,
    batch_partial: DataFrame,
    vroot: str | None = None,
) -> None:
    """Replay-safe foreachBatch fold: merge ``batch_partial`` into the
    standing state via ``merge_fn(existing, partial)``.

    foreachBatch delivers each micro-batch AT LEAST once (a crash
    between sink write and checkpoint commit replays the batch), and a
    read-modify-overwrite fold would re-add the replayed partial,
    permanently inflating the state. Instead each merged result is
    written to a batch_id-versioned directory
    ``<target>.versions/v=<batch_id>`` and the live ``target_dir`` is a
    mirror of the newest committed version:

    - a replayed batch whose version already committed (``_SUCCESS``
      present) SKIPS the merge — only the idempotent mirror reruns;
    - the merge reads the PREVIOUS version and writes a NEW directory,
      so the read-then-overwrite-same-path hazard (and the
      cache()+count() barrier it forced) disappears structurally — a
      torn write without ``_SUCCESS`` is simply overwritten on replay;
    - all but the two newest committed versions (plus the current
      lineage tip ``v=batch_id``, which the next batch's merge reads)
      are pruned, so storage stays O(state), not O(state × batches).

    Retention horizon caveat (inherent to ANY bounded-retention fold,
    same as Delta VACUUM): a checkpoint restored from a backup OLDER
    than the pruned lineage can only converge once the replay passes a
    still-retained version; restore backups together with (or newer
    than) the sink's retained versions.
    """
    import shutil

    # vroot defaults NEXT TO the target; a caller whose target is a
    # partition directory inside a discoverable table must pass an
    # explicit vroot OUTSIDE the table root, or partition discovery
    # would read '<dir>.versions' as a (garbage) partition value
    if vroot is None:
        vroot = target_dir + ".versions"
    vdir = os.path.join(vroot, f"v={batch_id}")
    committed = _committed_versions(vroot)
    prev = [b for b in committed if b < batch_id]
    if batch_id not in committed:
        existing = (
            sp.read.parquet(os.path.join(vroot, f"v={prev[-1]}"))
            if prev
            else None
        )
        merge_fn(existing, batch_partial).write.mode("overwrite").parquet(
            vdir
        )
    # mirror the NEWEST committed version to the live serving path —
    # not necessarily this batch's: a replay of an older committed
    # batch (skip branch above) must never regress the table
    final_committed = _committed_versions(vroot)
    newest = max(final_committed)
    sp.read.parquet(os.path.join(vroot, f"v={newest}")).write.mode(
        "overwrite"
    ).parquet(target_dir)
    # prune from the FULL committed list, not just versions below
    # batch_id: after a checkpoint restored from backup replays older
    # batches, stale versions ABOVE batch_id also exist and would never
    # be pruned on the prev-only path, breaking the two-version storage
    # bound. Keep the two newest PLUS v=batch_id — the current lineage
    # tip must survive as the next batch's merge source even when two
    # stale future versions outrank it (pruned futures are recomputed
    # deterministically as the replay catches up). Bound: 2 versions in
    # normal flow, at most 3 during a backup-restore replay.
    keep = set(sorted(final_committed)[-2:]) | {batch_id}
    for b in final_committed:
        if b not in keep:
            shutil.rmtree(os.path.join(vroot, f"v={b}"), ignore_errors=True)


def countmin_cells(df: DataFrame) -> DataFrame:
    """d=4 × w=256 count-min cells over the payload key ``props.k`` —
    the same md5 row-hash construction as agg_countmin_sketch, reduced
    to (d, col, cnt) partials. Mergeable by cell-wise addition."""
    keys = df.select(
        F.get_json_object("props", "$.k").cast("string").alias("k")
    ).filter(F.col("k").isNotNull())
    depths = df.sparkSession.range(0, 4).select(
        F.col("id").cast("int").alias("d")
    )
    col = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("d").cast("string"), "k")), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 256
    )
    return (
        keys.crossJoin(F.broadcast(depths))
        .withColumn("col", col)
        .groupBy("d", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_countmin(existing: DataFrame | None, batch_cells: DataFrame) -> DataFrame:
    """Cell-wise addition of count-min partials — the sketch's merge
    operator (commutative + associative, so micro-batch arrival order
    can never change the final sketch)."""
    if existing is None:
        return batch_cells
    e, b = existing.alias("e"), batch_cells.alias("b")
    zero = F.lit(0).cast("long")
    return e.join(
        b,
        (F.col("e.d") == F.col("b.d")) & (F.col("e.col") == F.col("b.col")),
        "full_outer",
    ).select(
        F.coalesce("b.d", "e.d").alias("d"),
        F.coalesce("b.col", "e.col").alias("col"),
        (F.coalesce("e.cnt", zero) + F.coalesce("b.cnt", zero)).alias("cnt"),
    )


def run_streaming_countmin_merge(
    spark: SparkSession,
    src_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    files_per_batch: int = 2,
) -> int:
    """Streaming sketch maintenance: each micro-batch reduces to its
    1024-cell count-min partial (constant bytes regardless of batch
    size) and folds into the standing sketch table — the pattern that
    keeps heavy-hitter estimates fresh at ingest time without any
    corpus re-scan. Because the merge is cell-wise addition AND the
    versioned fold skips already-committed batches on replay
    (cell addition is NOT idempotent — a replayed batch added twice
    would inflate counts forever), the final sketch is bit-identical
    to the one-shot batch sketch — asserted in tests/test_streaming.py,
    including under a simulated crash-replay. Returns micro-batch
    count."""
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_batch))
        .parquet(src_dir)
    )
    n_batches = 0

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        _fold_versioned(
            batch_df.sparkSession,
            target_dir,
            batch_id,
            merge_countmin,
            countmin_cells(batch_df),
        )

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


def stream_neardup_band_flags(docs: DataFrame) -> DataFrame:
    """Streaming near-duplicate detection at INGEST time: each arriving
    document's MinHash band signatures (identical construction to the
    batch llm_dedup_near_minhash) probe per-(band_id, sig) keyed state
    holding the bucket's first-arrived doc; any later bucket-mate is
    emitted as a candidate-dup flag the moment it arrives — the
    pattern that keeps a crawl frontier deduped WITHOUT re-scanning
    the corpus per batch (the streaming sibling of
    llm_dedup_incremental_batch).

    State is one doc_id per occupied bucket (constant bytes/bucket,
    the same band index the batch pipeline persists). Within a
    micro-batch, arrival order is made deterministic by doc_id sort,
    so the test can assert exact per-bucket flag counts against the
    batch bucket census. Append mode; no watermark — the band index
    legitimately lives forever (bounded by distinct signatures, not by
    time); a production deployment ages buckets out with a TTL policy
    if the frontier is time-scoped."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .operators.llm import (
        _explode_bands,
        _minhash_sig_cols,
        _shingle_arrays,
    )

    sigs = _shingle_arrays(docs).select("doc_id", *_minhash_sig_cols())
    bands = _explode_bands(sigs).filter(F.col("sig").isNotNull())
    out_schema = "doc_id bigint, band_id int, sig string, first_doc_id bigint"
    state_schema = "first bigint"

    def fn(key, pdf_iter, state: GroupState):
        ids: list[int] = []
        for pdf in pdf_iter:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort()
        if state.exists:
            (first,) = state.get
            flagged = ids
        else:
            first = ids[0]
            flagged = ids[1:]
        state.update((first,))
        if flagged:
            yield pd.DataFrame(
                {
                    "doc_id": flagged,
                    "band_id": [int(key[0])] * len(flagged),
                    "sig": [key[1]] * len(flagged),
                    "first_doc_id": [first] * len(flagged),
                }
            )

    return bands.groupBy("band_id", "sig").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_rate_limit_stats(
    events: DataFrame,
    evict: bool = False,
    evict_log_dir: str | None = None,
) -> DataFrame:
    """Streaming face of ``evt_rate_limit_burst`` (WAVE9 candidate 1):
    per-user trailing-60s burst accounting over the live event stream —
    the quota metric an API gateway keys admission on — via
    ``applyInPandasWithState`` keyed on user_id.

    State per user is O(60s of events), not O(history): a sorted buffer
    of event-time µs within 60s of the max seen, plus three counters
    (n_events, max_burst, n_nulls). Each batch merges its (sorted)
    arrivals into the buffer, recomputes trailing-window counts with a
    vectorized two-pointer pass, folds them into max_burst, and prunes
    the buffer to the last 60s. Pruning is exact when ingest is
    time-ordered ACROSS batches (the prepare_stream_source_timeordered
    contract, and the rough reality of a live feed): a future event's
    window can never reach behind max_ts − 60s. Recomputing a buffered
    event's window after pruning can only under-count (its lookback may
    be gone), and max() with the stored max_burst keeps the earlier
    exact value — so the fold is monotone-safe under any batch cut.

    NULL event times mirror the batch form's RANGE-frame semantics
    exactly: rows with a NULL order key form ONE peer group whose frame
    is all NULL rows, so their burst equals the user's NULL count —
    tracked as n_nulls and folded into max_burst at emission.

    At 100 TB: state is per-key and time-bounded (60s × per-user rate);
    the shuffle is the same user_id layout as the batch window's
    partition — no new shuffle class.

    ``evict=True`` (WAVE11 candidate 4) arms the production form: a
    watermark (delay 60 s) plus ``EventTimeTimeout`` timers that PRUNE
    an idle user's event buffer once the watermark passes their last
    buffered event + 60 s. PRECONDITION (measured, seal r11): the
    watermark makes Spark late-filter rows at-or-behind it before the
    processor — the watermark starts at epoch 0, so epoch-default
    timestamps are lost from the first batch — which is why the
    registered keys stay NoTimeout and this form is for feeds behind
    ingest plausibility bounds (``bound_event_time``). Safety is the same monotone argument as
    batch-cut pruning: a future event t arrives on the time-ordered
    frontier with t ≥ watermark, and every dropped buffer entry is
    < watermark − 60 s < t − 60 s — outside any window a future event
    can open — so the availableNow answer is IDENTICAL to the
    NoTimeout form (that invariant IS tests/test_streaming_eviction).
    The three counters (n_events, max_burst, n_nulls) are the
    irreducible answer-state of the registered lifetime aggregate and
    survive eviction; a 24/7 deployment that also needed to retire
    whole keys would age the finalized counters into a compacted sink
    (the foreachBatch upsert pattern in this module) rather than drop
    them. NULL-ts rows never set timers (no event time), so the
    NULL peer-group semantics are untouched. ``evict_log_dir`` is test
    instrumentation: each pruned key drops a marker file, proving
    timers actually fired in an equivalence run."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id bigint, n_events bigint, max_burst_60s bigint, "
        "over_limit boolean"
    )
    state_schema = (
        "buf array<bigint>, n_events bigint, max_burst bigint, "
        "n_nulls bigint"
    )
    window_us = 60_000_000

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            # idle past the horizon: prune the buffer, keep the
            # O(1) counters; no emission — the running answer cannot
            # have changed since the last data batch emitted it
            buf, n_events, max_burst, n_nulls = state.get
            state.update(([], n_events, max_burst, n_nulls))
            if evict_log_dir:
                with open(
                    os.path.join(evict_log_dir, f"rlb_{key[0]}"), "w"
                ):
                    pass
            return
        buf, n_events, max_burst, n_nulls = (
            state.get if state.exists else ([], 0, 0, 0)
        )
        buf = np.asarray(buf, dtype=np.int64)
        # Accumulate the key's WHOLE micro-batch before merging: the
        # iterator's pandas chunks follow arrow.maxRecordsPerBatch cuts
        # and are NOT time-ordered among themselves, so a per-chunk
        # merge-and-prune could discard lookback context a later chunk's
        # earlier events still need (only the cross-BATCH frontier is
        # ordered, per the timeordered-source contract).
        chunks = []
        for pdf in pdf_iter:
            ts = pd.to_datetime(pdf["ts"])
            null_mask = ts.isna()
            n_events += len(pdf)
            n_nulls += int(null_mask.sum())
            # explicit µs unit: pandas may hand datetime64[ns] or [us]
            # depending on the Arrow path, so convert via numpy's unit
            # cast instead of assuming the epoch integer's resolution
            chunks.append(
                ts[~null_mask]
                .to_numpy(dtype="datetime64[us]")
                .astype(np.int64)
            )
        new = (
            np.concatenate(chunks) if chunks else np.array([], np.int64)
        )
        if len(new):
            merged = np.sort(np.concatenate([buf, new]))
            hi = np.searchsorted(merged, merged, side="right")
            lo = np.searchsorted(merged, merged - window_us, side="left")
            max_burst = max(max_burst, int((hi - lo).max()))
            buf = merged[merged >= merged[-1] - window_us]
        state.update((buf.tolist(), n_events, max_burst, n_nulls))
        if evict and len(buf):
            # fire once the watermark passes the newest buffered event
            # + the window span; clamp above the current watermark
            # (EventTimeTimeout rejects a timer at-or-before it)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(int(buf[-1]) // 1000 + 60_001, wm_ms + 1)
            )
        burst_out = max(max_burst, n_nulls)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "max_burst_60s": [burst_out],
                "over_limit": [burst_out >= 3],
            }
        )

    stream = events.withWatermark("ts", "60 seconds") if evict else events
    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_token_bucket_admission(
    events: DataFrame,
    evict: bool = False,
    evict_log_dir: str | None = None,
) -> DataFrame:
    """Streaming face of ``evt_token_bucket_admission`` (WAVE10
    candidate 3): per-user token-bucket quota enforcement at ingest —
    capacity 1 token, refill 1 token per hour of EVENT time, one token
    per event — via ``applyInPandasWithState`` keyed on user_id.

    State per user is FIVE integers (bucket level µ, last event ts µs,
    admitted, rejected, min rejected event_id) — O(1), the true
    100 TB-scale form of the batch twin's per-user collect-fold. Each
    batch accumulates all its arrow chunks (chunks are not
    time-ordered), sorts by (ts-sentinel, event_id-sentinel) exactly
    like the batch fold, and replays the bucket. Cross-batch
    correctness needs the time-ordered ingest frontier
    (prepare_stream_source_timeordered): refill depends on the gap
    since the LAST event, so an out-of-order arrival across batches
    would see a different gap than the batch fold — within a batch the
    sort handles any disorder. NULL-ts events are rejected without
    touching the bucket (no clock, no refill) and NULL event_ids are
    excluded from min_rejected_event_id — both via the same MAXLONG
    sentinels as the batch twin, so the two forms are bit-equal and
    share one DuckDB oracle.

    ``evict=True`` (WAVE11 candidate 4) arms the TTL'd refill form: an
    ``EventTimeTimeout`` timer at the bucket's time-to-full NORMALIZES
    an idle user's clock state to the fresh-init sentinel
    (tok = CAP, lt = −1) once the watermark proves the bucket has
    refilled to capacity. Safety: refill is monotone in the gap, so a
    bucket full at the watermark is full for every future event
    t ≥ watermark (time-ordered frontier), and the fold from
    (CAP, −1) is identical to the un-normalized fold — the
    availableNow answer is IDENTICAL to NoTimeout
    (tests/test_streaming_eviction asserts it). The three counters
    (ad, rj, mr) are the irreducible answer-state of the registered
    lifetime aggregate and survive normalization — a deployment
    retiring whole keys would age them into a compacted sink first.
    If the watermark passes before the bucket refills, the timer
    re-arms at the remaining time-to-full instead of normalizing
    early (a mid-refill reset would UNDER-refill: the split
    ⌊(wm−lt)/div⌋ + ⌊(t−wm)/div⌋ ≤ ⌊(t−lt)/div⌋ is an inequality,
    not an identity — only the saturated bucket is reset-safe)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .operators.events_time import (
        _TB_CAP,
        _TB_COST,
        _TB_DIV,
        _TB_MAXL,
    )

    out_schema = (
        "user_id bigint, n_events bigint, n_admitted bigint, "
        "n_rejected bigint, min_rejected_event_id bigint, "
        "final_tokens_u bigint"
    )
    state_schema = (
        "tok bigint, lt bigint, ad bigint, rj bigint, mr bigint"
    )

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            tok, lt, ad, rj, mr = state.get
            wm_us = state.getCurrentWatermarkMs() * 1000
            if lt == -1 or tok + (wm_us - lt) // _TB_DIV >= _TB_CAP:
                # saturated: reset the clock pair to the fresh-init
                # sentinel — the fold from (CAP, -1) is identical
                state.update((_TB_CAP, -1, ad, rj, mr))
                if evict_log_dir:
                    with open(
                        os.path.join(evict_log_dir, f"tb_{key[0]}"), "w"
                    ):
                        pass
            else:
                # not yet full (watermark outran the timer): re-arm at
                # the remaining time-to-full, never reset mid-refill
                state.update((tok, lt, ad, rj, mr))
                state.setTimeoutTimestamp(
                    max(
                        (lt + (_TB_CAP - tok) * _TB_DIV) // 1000 + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
            return
        tok, lt, ad, rj, mr = (
            state.get if state.exists else (_TB_CAP, -1, 0, 0, _TB_MAXL)
        )
        ts_chunks, eid_chunks = [], []
        for pdf in pdf_iter:
            ts = pd.to_datetime(pdf["ts"])
            t_us = ts.to_numpy(dtype="datetime64[us]").astype(np.int64)
            t_us = np.where(ts.isna().to_numpy(), _TB_MAXL, t_us)
            eid = pdf["event_id"].astype("Int64")
            e = np.where(
                eid.isna().to_numpy(),
                _TB_MAXL,
                eid.fillna(0).astype(np.int64).to_numpy(),
            )
            ts_chunks.append(t_us)
            eid_chunks.append(e)
        if ts_chunks:
            t_all = np.concatenate(ts_chunks)
            e_all = np.concatenate(eid_chunks)
            order = np.lexsort((e_all, t_all))
            for t, e in zip(t_all[order], e_all[order]):
                t, e = int(t), int(e)
                if t == _TB_MAXL:
                    rj += 1
                    if e != _TB_MAXL:
                        mr = min(mr, e)
                    continue
                ref = min(
                    _TB_CAP, tok + (0 if lt == -1 else (t - lt) // _TB_DIV)
                )
                if ref >= _TB_COST:
                    tok, lt, ad = ref - _TB_COST, t, ad + 1
                else:
                    tok, lt, rj = ref, t, rj + 1
                    if e != _TB_MAXL:
                        mr = min(mr, e)
        state.update((tok, lt, ad, rj, mr))
        if evict and lt != -1 and tok < _TB_CAP:
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(
                    (lt + (_TB_CAP - tok) * _TB_DIV) // 1000 + 1,
                    wm_ms + 1,
                )
            )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [ad + rj],
                "n_admitted": [ad],
                "n_rejected": [rj],
                "min_rejected_event_id": [None if mr == _TB_MAXL else mr],
                "final_tokens_u": [tok],
            }
        )

    stream = events.withWatermark("ts", "60 seconds") if evict else events
    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )


def merge_user_partials_evolving(
    existing: DataFrame | None, batch: DataFrame
) -> DataFrame:
    """merge_user_partials widened for SCHEMA EVOLUTION: the source may
    gain a ``flag_val`` column mid-stream (new producer generation), so
    the fold must (a) aggregate it when the batch carries it, (b) treat
    its absence as zero, and (c) WIDEN a standing state table written
    before the evolution (no ``flag_sum`` column yet) instead of losing
    or forking it — the mergeSchema story applied to streaming state."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_ts"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "value_cents"
        ),
    ]
    zero = F.lit(0).cast("long")
    if "flag_val" in batch.columns:
        aggs.append(
            F.sum(F.coalesce(F.col("flag_val").cast("long"), zero)).alias(
                "flag_sum"
            )
        )
    part = batch.groupBy("user_id").agg(*aggs)
    if "flag_sum" not in part.columns:
        part = part.withColumn("flag_sum", zero)
    if existing is None:
        return part
    if "flag_sum" not in existing.columns:
        # pre-evolution state: widen, don't fork — rows folded before
        # the new column existed contribute 0 to it by definition
        existing = existing.withColumn("flag_sum", zero)
    e, b = existing.alias("e"), part.alias("b")
    return e.join(
        b, F.col("e.user_id").eqNullSafe(F.col("b.user_id")), "full_outer"
    ).select(
        F.coalesce("b.user_id", "e.user_id").alias("user_id"),
        (
            F.coalesce("e.n_events", zero) + F.coalesce("b.n_events", zero)
        ).alias("n_events"),
        F.greatest("e.last_ts", "b.last_ts").alias("last_ts"),
        (
            F.coalesce("e.value_cents", zero)
            + F.coalesce("b.value_cents", zero)
        ).alias("value_cents"),
        (
            F.coalesce("e.flag_sum", zero) + F.coalesce("b.flag_sum", zero)
        ).alias("flag_sum"),
    )


def run_exactly_once_sink_evolving(
    spark: SparkSession,
    src_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema,
    files_per_batch: int = 1,
    crash_on_nth_commit: int | None = None,
) -> list[int]:
    """run_exactly_once_sink with a CALLER-SUPPLIED source schema and
    the evolution-aware merge: each restart passes the schema the
    source currently has, so a stream killed under the gen-1 schema
    can resume under the widened gen-2 schema — parquet files written
    before the evolution null-fill the new column at read time, and
    ``merge_user_partials_evolving`` widens the standing state. Same
    two-phase versioned commit protocol and kill window as the
    non-evolving runner."""
    commits: list[int] = []

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _fold_versioned(
            batch_df.sparkSession,
            target_dir,
            batch_id,
            merge_user_partials_evolving,
            batch_df,
        )
        commits.append(batch_id)
        if (
            crash_on_nth_commit is not None
            and len(commits) == crash_on_nth_commit
        ):
            raise InjectedSinkCrash(
                f"{_X1_CRASH_MARKER}: killed after sink commit of batch "
                f"{batch_id}, before its checkpoint commit"
            )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_batch))
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    except Exception as ex:  # noqa: BLE001 — re-raised unless ours
        if crash_on_nth_commit is None or _X1_CRASH_MARKER not in str(ex):
            raise
    return commits


def prepare_stream_source_evolving(
    spark: SparkSession, sf_dir: str, out1: str, out2: str
) -> tuple[str, str]:
    """Two source GENERATIONS of the events feed for the
    schema-evolving exactly-once sink: gen-1 files carry the original
    schema (rows with ``(event_id & 3) < 2``); gen-2 files carry the
    WIDENED schema — the same remaining rows plus a new ``flag_val``
    column (``event_id & 7``; bitwise ops are two's-complement in both
    engines, so the derivation is oracle-exact even on hostile negative
    ids). Each generation is fanned into 2 files so the sink sees
    multiple micro-batches per generation. Both dirs sealed per fixture
    via the shared ``_cached`` rule."""
    from .operators.scans import _cached, _seal_cache

    ev = load(spark, sf_dir, "events")
    gen_bits = F.coalesce(F.col("event_id"), F.lit(0)).bitwiseAND(F.lit(3))
    p1 = "prepare_stream_source_evolving:gen1"
    if not _cached(out1, sf_dir, "events", p1):
        (
            ev.where(gen_bits < 2)
            .repartition(2)
            .write.mode("overwrite")
            .parquet(out1)
        )
        _seal_cache(out1, sf_dir, "events", p1)
    p2 = "prepare_stream_source_evolving:gen2"
    if not _cached(out2, sf_dir, "events", p2):
        (
            ev.where(gen_bits >= 2)
            .withColumn(
                "flag_val",
                F.coalesce(F.col("event_id"), F.lit(0))
                .bitwiseAND(F.lit(7))
                .cast("int"),
            )
            .repartition(2)
            .write.mode("overwrite")
            .parquet(out2)
        )
        _seal_cache(out2, sf_dir, "events", p2)
    return out1, out2


def prepare_stream_source_docs_ordered(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Fan the documents fixture into ``n_files`` parquet files split
    by DOC_ID range, mtimes ascending — the crawl-frontier feed shape
    (monotone ingest ids) under which keep-first exact dedup is
    well-defined across micro-batches: every doc's dedup predecessors
    arrive in earlier batches or earlier in its own batch. NULL doc_id
    rows ride the FIRST file, matching the batch window's
    asc_nulls_first order. Idempotent per out_dir (shared _cached
    rule)."""
    import shutil
    import time as _time

    from .operators.scans import _cached, _seal_cache

    params = f"prepare_stream_source_docs_ordered:n_files={n_files}"
    if _cached(out_dir, sf_dir, "documents", params):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs = load(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    if bounds.lo is None:
        n_files = 1
        cuts = []
    else:
        span = int(bounds.hi) - int(bounds.lo)
        cuts = [
            int(bounds.lo) + span * i // n_files for i in range(n_files + 1)
        ]
    now = _time.time()
    for i in range(n_files):
        if not cuts:
            cond = F.lit(True)
        else:
            cond = (F.col("doc_id") >= cuts[i]) & (
                (F.col("doc_id") < cuts[i + 1])
                if i < n_files - 1
                else (F.col("doc_id") <= cuts[i + 1])
            )
            if i == 0:
                cond = cond | F.col("doc_id").isNull()
        tmp = out_dir + f"_t{i}"
        docs.where(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(out_dir, f"frontier{i:02d}.parquet")
        shutil.copyfile(os.path.join(tmp, part), dst)
        mt = now - 600 + i * 60
        os.utime(dst, (mt, mt))
        shutil.rmtree(tmp)
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass
    _seal_cache(out_dir, sf_dir, "documents", params)
    return out_dir


def fold_drift_census(existing: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Micro-batch fold of the curation-drift funnel census — the
    streaming maintenance of llm_curation_drift_monitor's table.

    State = per-(hash, cohort, stage) counts. A batch's dispositions
    need ONE thing from standing state: how many quality-PASSING docs
    of each hash have already been admitted (their stage is 'kept' or
    'exact_dup' — passing is definitionally what competes in the
    rank). The batch's own docs rank within the batch by doc_id, so on
    a doc_id-ordered frontier the global survivor rank is
    prior_passes(h) + within-batch rank — exactly the batch monitor's
    cross-corpus window, maintained incrementally. Dispositions then
    census per (h, cohort, stage) and merge ADDITIVELY (order-free
    integer sums).

    Scale shape: per batch, one batch-local window (16-byte digests),
    one hash equi-join against the standing index, one additive merge
    — O(batch + state), the llm_dedup_incremental_batch economics; at
    production scale the state table is bucketed on h so the probe
    join never reshuffles it."""
    from .operators.llm import _funnel_fields, _funnel_passes, _funnel_stage
    from pyspark.sql.window import Window as _W

    f = _funnel_fields(
        batch,
        F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b"),
    )
    w = (
        _W.partitionBy("h")
        .orderBy("doc_id")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    ranked = f.withColumn(
        "brank", F.sum(F.when(_funnel_passes(), 1).otherwise(0)).over(w)
    )
    if existing is not None:
        prior = (
            existing.where(F.col("stage").isin("kept", "exact_dup"))
            .groupBy("h")
            .agg(F.sum("n").alias("prior_pass"))
        )
        ranked = ranked.join(prior, "h", "left")
    else:
        ranked = ranked.withColumn("prior_pass", F.lit(None).cast("long"))
    surv = F.coalesce(F.col("prior_pass"), F.lit(0)) + F.col("brank")
    census = (
        ranked.select(
            "h", "cohort", _funnel_stage(surv).alias("stage")
        )
        .groupBy("h", "cohort", "stage")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    if existing is None:
        return census
    return (
        existing.unionByName(census)
        .groupBy("h", "cohort", "stage")
        .agg(F.sum("n").alias("n"))
    )


def run_drift_monitor_stream(
    spark: SparkSession,
    src_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    files_per_batch: int = 1,
) -> int:
    """Drain a documents frontier through the drift-census fold under
    the two-phase versioned commit protocol (exactly-once under
    foreachBatch's at-least-once replay). Returns micro-batch count."""
    schema = spark.read.parquet(src_dir).schema
    n_batches = 0

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        _fold_versioned(
            batch_df.sparkSession,
            target_dir,
            batch_id,
            fold_drift_census,
            batch_df,
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_batch))
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


def fold_pack_census(existing: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Micro-batch fold of the token-shard packing census — the
    streaming maintenance of llm_pack_token_shards' table.

    State = the per-shard census itself; the standing token offset is
    DERIVED from it (every token lands in a shard, so
    sum(shard_tokens) is the running total — no second state table).
    Each batch's docs take shard ids from offset + the within-batch
    exclusive prefix sum over doc_id order (the distributed
    scale_rank.with_cumsum, never a single-partition funnel), then the
    batch census merges additively: counts/tokens sum, doc spans
    min/max — all order-free integer folds. Sound on a doc_id-ordered
    frontier, where every earlier-id doc arrives no later.

    Scale shape: per batch — one range-shuffle prefix sum over the
    BATCH (not the corpus), a broadcast 1-row offset, one additive
    shard-grain merge; state is shard-cardinality (corpus_tokens /
    2000 rows), never per-doc."""
    from .operators.llm import _tokens
    from .operators.scale_rank import with_cumsum

    toks = batch.select(
        "doc_id", F.size(_tokens()).alias("n_tokens")
    )
    if existing is not None:
        off_row = existing.agg(
            F.coalesce(F.sum("shard_tokens"), F.lit(0))
            .cast("bigint")
            .alias("__off_tot")
        )
    else:
        off_row = None
    cum = with_cumsum(
        toks, [F.col("doc_id").asc()], ["n_tokens"], ["__cum_incl"]
    )
    if off_row is not None:
        cum = cum.crossJoin(F.broadcast(off_row))
        running = (
            F.col("__off_tot") + F.col("__cum_incl") - F.col("n_tokens")
        )
    else:
        running = F.col("__cum_incl") - F.col("n_tokens")
    packed = cum.withColumn(
        "shard_id", F.floor(running / 2000.0).cast("int")
    )
    census = packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
    if existing is None:
        return census
    return (
        existing.unionByName(census)
        .groupBy("shard_id")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("shard_tokens").alias("shard_tokens"),
            F.min("first_doc").alias("first_doc"),
            F.max("last_doc").alias("last_doc"),
        )
    )


def run_pack_shards_stream(
    spark: SparkSession,
    src_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    files_per_batch: int = 1,
) -> int:
    """Drain a documents frontier through the pack-census fold under
    the two-phase versioned commit protocol. Returns batch count."""
    schema = spark.read.parquet(src_dir).schema
    n_batches = 0

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        _fold_versioned(
            batch_df.sparkSession,
            target_dir,
            batch_id,
            fold_pack_census,
            batch_df,
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_batch))
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


def fold_distinct_census(existing: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Micro-batch fold of EXACT distinct-user bitmaps per event type —
    the streaming maintenance of agg_bitmap_distinct_rollup's state:
    each batch reduces to (event_type, bucket) bitmap partials
    (bitmap_construct_agg over bit positions), and the standing state
    merges by commutative bitmap OR — order-free, replay-safe under
    the versioned fold, and EXACT (unlike an HLL fold, a re-merged
    bitmap never drifts). State is O(distinct users / 64) rows per
    type, corpus-size-independent per batch; NULL users are excluded
    (count(DISTINCT) semantics)."""
    part = (
        batch.where(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    if existing is None:
        return part
    return (
        existing.unionByName(part)
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
    )


def run_distinct_census_stream(
    spark: SparkSession,
    src_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    files_per_batch: int = 1,
) -> int:
    """Drain an events feed through the exact-distinct bitmap fold
    under the two-phase versioned commit protocol."""
    schema = spark.read.parquet(src_dir).schema
    n_batches = 0

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        _fold_versioned(
            batch_df.sparkSession,
            target_dir,
            batch_id,
            fold_distinct_census,
            batch_df,
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_batch))
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches
