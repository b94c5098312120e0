"""Stream-mode tests: the same tf_* transformations that pass the
batch oracle are executed via readStream + Trigger.AvailableNow and
must agree with batch (e1/e3), dedupe injected duplicates (e5), and
maintain custom state (e7)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from hive_to_es_spark.io import read_table
from hive_to_es_spark.streaming.ops import (
    e5_duped_input,
    tf_click_purchase_join,
    tf_dedup,
    tf_session,
    tf_stateful_counters_stream,
    tf_tumbling,
    tf_watermark_tumbling,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """A streamable directory: events re-written (ns fix applied) as
    proper timestamp parquet."""
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    read_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def _run_available_now(spark, stream_df, tmp_path, mode="complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName("qtest")
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("qtest").collect()
    q.stop()
    return out


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_tumbling_stream_equals_batch(spark, events_dir, tmp_path):
    batch_df = spark.read.parquet(events_dir)
    expected = _canon(tf_tumbling(batch_df).collect())
    stream_src = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    got = _canon(_run_available_now(spark, tf_tumbling(stream_src), tmp_path))
    assert got == expected


def test_session_stream_equals_batch(spark, events_dir, tmp_path):
    batch_df = spark.read.parquet(events_dir)
    expected = _canon(tf_session(batch_df).collect())
    stream_src = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    got = _canon(_run_available_now(spark, tf_session(stream_src), tmp_path))
    assert got == expected


def test_watermarked_agg_runs_in_stream_mode(spark, events_dir, tmp_path):
    """Watermark + append mode: finalized windows are emitted once all
    data is consumed (AvailableNow drains everything, so every window
    below the final watermark appears)."""
    batch_df = spark.read.parquet(events_dir)
    stream_src = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    got = _run_available_now(
        spark, tf_watermark_tumbling(stream_src), tmp_path, mode="append"
    )
    assert len(got) > 0


def test_stream_dedup_drops_injected_duplicates(spark, events_dir, tmp_path):
    """The same events directory listed twice = every event duplicated;
    stateful dropDuplicates must restore uniqueness."""
    dup_dir = str(tmp_path / "dup")
    shutil.copytree(events_dir, dup_dir)
    for f in list(__import__("os").listdir(events_dir)):
        if f.endswith(".parquet"):
            shutil.copy(f"{events_dir}/{f}", f"{dup_dir}/dup_{f}")
    batch_df = spark.read.parquet(dup_dir)
    n_unique = batch_df.select("event_id").distinct().count()
    assert batch_df.count() == 2 * n_unique  # duplication really happened
    stream_src = spark.readStream.schema(batch_df.schema).parquet(dup_dir)
    got = _run_available_now(
        spark, tf_dedup(stream_src).select("event_id"), tmp_path, mode="append"
    )
    ids = [r.event_id for r in got]
    assert len(ids) == n_unique == len(set(ids))


def test_e5_batch_input_really_contains_duplicates(spark, events_dir):
    """The registered e5 batch query's input must be non-vacuous: the
    union carries real duplicates, so a no-op dedup would produce MORE
    rows than the oracle and fail the hash gate."""
    ev = spark.read.parquet(events_dir)
    duped = e5_duped_input(ev)
    n_in, n_unique = duped.count(), ev.count()
    assert n_in > n_unique  # the sample really injected duplicates
    assert tf_dedup(duped).count() == n_unique


def test_stateful_counters_stream_final_state(spark, events_dir, tmp_path):
    """applyInPandasWithState: after draining the stream, the last
    update per user must equal the batch per-user totals."""
    batch_df = spark.read.parquet(events_dir)
    expected = {
        r.user_id: (r.n_events, r.total_cents)
        for r in batch_df.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("total_cents"),
        )
        .collect()
    }
    stream_src = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    rows = _run_available_now(
        spark, tf_stateful_counters_stream(stream_src), tmp_path, mode="update"
    )
    # keep the LAST emitted state per user (updates accumulate)
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.total_cents)
    assert final == expected


def test_sliding_stream_equals_batch(spark, events_dir, tmp_path):
    from hive_to_es_spark.streaming.ops import tf_sliding

    batch_df = spark.read.parquet(events_dir)
    expected = _canon(tf_sliding(batch_df).collect())
    stream_src = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    got = _canon(_run_available_now(spark, tf_sliding(stream_src), tmp_path))
    assert got == expected


def test_stream_static_join_runs_in_stream_mode(spark, events_dir, sf_dir, tmp_path):
    from hive_to_es_spark.io import load_tables
    from hive_to_es_spark.streaming.ops import tf_static_join

    batch_df = spark.read.parquet(events_dir)
    dim = load_tables(spark, sf_dir).customer.select("c_custkey", "c_mktsegment")
    expected = _canon(tf_static_join(batch_df, dim).collect())
    stream_src = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    got = _canon(_run_available_now(spark, tf_static_join(stream_src, dim), tmp_path))
    assert got == expected


def test_foreach_batch_sink_delivers_all_rows(spark, events_dir, tmp_path):
    """foreachBatch bridging: every source row lands in the batch-
    writer sink exactly once for a single AvailableNow drain."""
    from hive_to_es_spark.streaming.sink import parquet_batch_writer, start_foreach_batch

    batch_df = spark.read.parquet(events_dir)
    sink = str(tmp_path / "sink")
    stream_src = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    q = start_foreach_batch(
        stream_src.select("event_id", "user_id", "value"),
        parquet_batch_writer(sink),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    q.stop()
    out = spark.read.parquet(sink)
    assert out.count() == batch_df.count()
    assert out.select("event_id").distinct().count() == batch_df.count()


def test_checkpoint_resume_no_duplicates(spark, events_dir, tmp_path):
    """Restarting from the same checkpoint after new files arrive must
    process ONLY the new files — the already-committed batch is not
    re-delivered (checkpoint = the incremental-sync contract)."""
    import os
    import shutil

    from hive_to_es_spark.streaming.sink import parquet_batch_writer, start_foreach_batch

    src = str(tmp_path / "src")
    os.makedirs(src)
    files = sorted(f for f in os.listdir(events_dir) if f.endswith(".parquet"))
    assert files
    shutil.copy(os.path.join(events_dir, files[0]), os.path.join(src, "a.parquet"))

    schema = spark.read.parquet(events_dir).schema
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = start_foreach_batch(
            spark.readStream.schema(schema).parquet(src).select("event_id"),
            parquet_batch_writer(sink),
            ckpt,
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    n_first = spark.read.parquet(sink).count()
    assert n_first > 0
    # second wave of data arrives, resume from the same checkpoint
    shutil.copy(os.path.join(events_dir, files[0]), os.path.join(src, "b.parquet"))
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == 2 * n_first  # file a NOT re-delivered


def test_max_files_per_trigger_bounds_batches(spark, events_dir, tmp_path):
    """Incremental batch-size control: maxFilesPerTrigger=1 over a
    multi-file source must produce multiple micro-batches (bounded
    memory per batch — the streaming form of p6's paging)."""
    import os
    import shutil

    from hive_to_es_spark.streaming.sink import start_foreach_batch

    src = str(tmp_path / "src")
    os.makedirs(src)
    files = [f for f in os.listdir(events_dir) if f.endswith(".parquet")]
    for i in range(3):  # three identical files -> at least 3 batches
        shutil.copy(os.path.join(events_dir, files[0]), os.path.join(src, f"f{i}.parquet"))
    schema = spark.read.parquet(events_dir).schema
    batch_ids = []

    def record(batch_df, batch_id):
        batch_ids.append((batch_id, batch_df.count()))

    q = start_foreach_batch(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        record,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    q.stop()
    assert len(batch_ids) >= 3
    n_one_file = spark.read.parquet(os.path.join(src, "f0.parquet")).count()
    assert all(n == n_one_file for _, n in batch_ids)


def _time_split_halves(spark, events_dir, tmp_path, split_ts=None):
    """Split events at a timestamp (default: median) into two parquet
    dirs — monotone arrival order, so feeding h1 then h2 never
    produces late-vs-watermark data and stream output must equal
    batch."""
    import os

    ev = spark.read.parquet(events_dir)
    if split_ts is None:
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        split_ts = lo + (hi - lo) / 2
    h1_dir, h2_dir = str(tmp_path / "h1"), str(tmp_path / "h2")
    ev.filter(F.col("ts") <= F.lit(split_ts)).write.mode("overwrite").parquet(h1_dir)
    ev.filter(F.col("ts") > F.lit(split_ts)).write.mode("overwrite").parquet(h2_dir)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _copy_parts(h1_dir, src, "a")
    return ev, h1_dir, h2_dir, src


def _copy_parts(from_dir, to_dir, prefix):
    import os

    for f in os.listdir(from_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(from_dir, f), os.path.join(to_dir, f"{prefix}_{f}"))


def test_stateful_checkpoint_recovery_counters(spark, events_dir, tmp_path):
    """Kill-and-restart for applyInPandasWithState (e7): drain half
    the data, STOP the query, deliver the second half, restart from
    the SAME checkpoint. Per-user counters must continue from the
    recovered state store — equal to one uninterrupted run — not
    restart from zero (the failure mode production state stores hit)."""
    import os

    from hive_to_es_spark.streaming.sink import parquet_batch_writer, start_foreach_batch

    ev, h1_dir, h2_dir, src = _time_split_halves(spark, events_dir, tmp_path)
    h1, h2 = spark.read.parquet(h1_dir), spark.read.parquet(h2_dir)
    both = h1.select("user_id").intersect(h2.select("user_id")).count()
    assert h1.count() > 0 and h2.count() > 0 and both > 0  # restart carries real state

    schema = ev.schema
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_once():
        q = start_foreach_batch(
            tf_stateful_counters_stream(
                spark.readStream.schema(schema).parquet(src)
            ),
            parquet_batch_writer(sink),
            ckpt,
            output_mode="update",
        )
        q.awaitTermination(120)
        q.stop()

    run_once()  # first half
    n_run1 = spark.read.parquet(sink).count()
    assert n_run1 > 0
    _copy_parts(h2_dir, src, "b")
    run_once()  # restart from checkpoint, second half arrives

    # final state per user = emitted row with the highest n_events
    # (counts are monotone across updates)
    final = {}
    for r in spark.read.parquet(sink).collect():
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.total_cents)
    expected = {
        r.user_id: (r.n_events, r.total_cents)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("total_cents"),
        )
        .collect()
    }
    # users present in BOTH halves prove continuity: a state store
    # restarting from zero would report only their second-half counts
    assert final == expected


def test_stream_stream_join_checkpoint_recovery(spark, events_dir, tmp_path):
    """Kill-and-restart for the watermarked stream-stream join (e8):
    clicks buffered in the join state during run 1 must survive the
    restart and match purchases that only arrive in run 2."""
    from hive_to_es_spark.streaming.sink import parquet_batch_writer, start_foreach_batch

    ev_full = spark.read.parquet(events_dir)
    expected = _canon(
        tf_click_purchase_join(
            ev_full.filter(F.col("event_type") == "click"),
            ev_full.filter(F.col("event_type") == "purchase"),
        ).collect()
    )
    assert expected
    # Split AT a matched pair's click_ts so its click arrives in run 1
    # and its purchase in run 2 — cross-boundary pairs are the
    # recovery proof. Pick the strict pair (click before purchase)
    # closest to the median for a balanced split.
    strict = sorted(
        (p for p in expected if p[4] < p[3]), key=lambda p: p[4]
    )  # click_ts < purchase_ts
    assert strict, "fixture must have click->purchase pairs with distinct ts"
    split_ts = strict[len(strict) // 2][4]
    ev, h1_dir, h2_dir, src = _time_split_halves(
        spark, events_dir, tmp_path, split_ts=split_ts
    )
    cross = [p for p in expected if p[4] <= split_ts < p[3]]
    assert cross, "split must leave click->purchase pairs spanning the boundary"

    schema = ev.schema
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        joined = tf_click_purchase_join(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "purchase"),
        )
        q = start_foreach_batch(joined, parquet_batch_writer(sink), ckpt)
        q.awaitTermination(120)
        q.stop()

    run_once()
    _copy_parts(h2_dir, src, "b")
    run_once()
    got = _canon(spark.read.parquet(sink).collect())
    assert got == expected


def test_stream_stream_join_equals_batch(spark, events_dir, tmp_path):
    """Stream-stream inner join (two readStream sides of the same
    source, split by event_type) must produce exactly the batch
    pairs. Inner-join rows emit on match; append mode is the only
    output mode a stream-stream join supports."""
    batch_df = spark.read.parquet(events_dir)
    expected = _canon(
        tf_click_purchase_join(
            batch_df.filter(F.col("event_type") == "click"),
            batch_df.filter(F.col("event_type") == "purchase"),
        ).collect()
    )
    assert expected  # fixture must actually produce attribution pairs

    src = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    joined = tf_click_purchase_join(
        src.filter(F.col("event_type") == "click"),
        src.filter(F.col("event_type") == "purchase"),
    )
    got = _canon(_run_available_now(spark, joined, tmp_path, mode="append"))
    assert got == expected


def test_stream_stream_outer_join_equals_batch_with_expiry(spark, events_dir, tmp_path):
    """LEFT OUTER stream-stream join (e10): a never-matched click may
    emit its NULL row only when the watermark PROVES no partner can
    arrive (watermark past click_ts + 1h). Run 1 drains the real data;
    run 2 delivers one far-future sentinel click that drags the final
    watermark past every real click's match window, flushing the
    remaining unmatched clicks. The union of both runs (the sentinel
    itself stays buffered — nothing ever outruns ITS window) must
    equal the batch LEFT JOIN, which the fixture makes non-vacuous in
    both directions: matched pairs AND expired-with-no-partner
    clicks."""
    import datetime as dt
    import os

    from hive_to_es_spark.streaming.ops import tf_click_purchase_join_outer
    from hive_to_es_spark.streaming.sink import parquet_batch_writer, start_foreach_batch

    batch_df = spark.read.parquet(events_dir)
    expected = _canon(
        tf_click_purchase_join_outer(
            batch_df.filter(F.col("event_type") == "click"),
            batch_df.filter(F.col("event_type") == "purchase"),
        ).collect()
    )
    unmatched = [p for p in expected if p[3] is None]
    assert unmatched, "fixture must contain clicks with no purchase in-window"
    assert len(unmatched) < len(expected), "fixture must also contain matches"

    src = str(tmp_path / "src")
    os.makedirs(src)
    _copy_parts(events_dir, src, "a")
    schema = batch_df.schema
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        joined = tf_click_purchase_join_outer(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "purchase"),
        )
        q = start_foreach_batch(joined, parquet_batch_writer(sink), ckpt)
        q.awaitTermination(120)
        q.stop()

    run_once()
    # Two flush runs: AvailableNow does not run the no-data batch that
    # would apply a watermark advanced by its OWN last batch, so run 2
    # advances the watermark past every real click's window and run 3
    # (whose data batch executes WITH that recovered watermark) emits
    # the remaining NULL rows. The sentinels themselves never emit in
    # a data batch (each run's batch uses the PRIOR run's watermark,
    # which never clears a sentinel's own window); user_id=-1 rows are
    # excluded anyway in case a future Spark adds the eager flush.
    max_ts = batch_df.agg(F.max("ts")).first()[0]
    for i, days in enumerate((10, 20)):
        # one click AND one purchase: the global watermark is the MIN
        # across both sides' watermark nodes, so a click-only sentinel
        # would leave the purchase-side watermark (and therefore the
        # join's eviction clock) stuck at the real data's horizon
        far = max_ts + dt.timedelta(days=days)
        sentinel = spark.createDataFrame(
            [
                (-999 - 2 * i, far, -1, "click", 0.0, None),
                (-998 - 2 * i, far + dt.timedelta(hours=3), -1, "purchase", 0.0, None),
            ],
            schema,
        )
        flush_dir = str(tmp_path / f"flush{i}")
        sentinel.coalesce(1).write.parquet(flush_dir)
        _copy_parts(flush_dir, src, f"b{i}")
        run_once()

    got = _canon(
        spark.read.parquet(sink).filter(F.col("user_id") != -1).collect()
    )
    assert got == expected


def test_session_window_checkpoint_recovery(spark, events_dir, tmp_path):
    """Kill-and-restart for session windows (e3) — the stateful op
    most sensitive to restart semantics: a session whose events span
    the restart boundary must come out as ONE merged session equal to
    the uninterrupted batch run, not two fragments (what a state store
    restarting empty would emit)."""
    from hive_to_es_spark.streaming.sink import parquet_batch_writer, start_foreach_batch

    ev_full = spark.read.parquet(events_dir)
    expected = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_cents)
        for r in tf_session(ev_full).collect()
    }
    max_ts = ev_full.agg(F.max("ts")).first()[0]

    # Split INSIDE a multi-event session: midpoint between its first
    # and last event, so its head arrives in run 1 and its tail in
    # run 2. (session_end = last event + 30min gap.) Streaming session
    # aggs only support APPEND mode — a session emits once the
    # watermark passes its end — so pick one that finalizes well
    # before the final watermark (max_ts - 1h).
    from datetime import timedelta

    sess = sorted(
        ((u, s), e)
        for (u, s), (e, n, _t) in expected.items()
        if n >= 2 and e < max_ts - timedelta(minutes=90)
    )
    assert sess, "fixture must contain early multi-event sessions"
    (user, s_start), s_end = sess[len(sess) // 2]
    split_ts = s_start + (s_end - timedelta(minutes=30) - s_start) / 2
    ev, h1_dir, h2_dir, src = _time_split_halves(
        spark, events_dir, tmp_path, split_ts=split_ts
    )
    # the chosen session really spans the boundary
    h1n = spark.read.parquet(h1_dir).filter(
        (F.col("user_id") == user) & (F.col("ts") >= s_start)
    ).count()
    h2n = spark.read.parquet(h2_dir).filter(
        (F.col("user_id") == user) & (F.col("ts") < s_end)
    ).count()
    assert h1n > 0 and h2n > 0, "split must land inside the session"

    schema = ev.schema
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        # streaming session aggregation requires a watermark and only
        # supports append mode; 1h > the 30min gap, and arrival is
        # monotone so nothing is ever late
        q = start_foreach_batch(
            tf_session(stream.withWatermark("ts", "1 hour")),
            parquet_batch_writer(sink),
            ckpt,
            output_mode="append",
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    _copy_parts(h2_dir, src, "b")
    run_once()

    # Append mode emits each session exactly once, when the watermark
    # finalizes it; sessions ending within 1h of max_ts never finalize
    # on a finite source, so compare against the batch run on both
    # sides of that horizon.
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_cents)
        for r in spark.read.parquet(sink).collect()
    }
    # everything emitted must match the uninterrupted batch run exactly
    assert got, "no sessions finalized"
    for key, v in got.items():
        assert expected.get(key) == v, (key, v, expected.get(key))
    # every session that provably finalized must have been emitted —
    # including the one whose events span the restart (merged, not
    # fragmented: a fragment would carry a different start or count)
    surely_final = {
        k: v for k, v in expected.items()
        if v[0] < max_ts - timedelta(minutes=90)
    }
    missing = set(surely_final) - set(got)
    assert not missing, missing
    assert (user, s_start) in got and got[(user, s_start)] == expected[(user, s_start)]


def test_sliding_window_checkpoint_recovery(spark, events_dir, tmp_path):
    """Kill-and-restart for sliding windows (e2): a window OPEN at the
    restart boundary accumulates events from both runs, so its final
    count equals the uninterrupted batch run only if the aggregation
    state survived the restart. Sliding windows multiply that proof:
    every event belongs to 4 overlapping windows (1h window, 15m
    slide), so the boundary cuts through several open windows at
    once."""
    from hive_to_es_spark.streaming.sink import parquet_batch_writer, start_foreach_batch
    from hive_to_es_spark.streaming.ops import tf_sliding

    ev_full = spark.read.parquet(events_dir)
    expected = {
        (r.window_start, r.event_type): r.n for r in tf_sliding(ev_full).collect()
    }
    max_ts = ev_full.agg(F.max("ts")).first()[0]

    ev, h1_dir, h2_dir, src = _time_split_halves(spark, events_dir, tmp_path)
    schema = ev.schema
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = start_foreach_batch(
            tf_sliding(stream.withWatermark("ts", "1 hour")),
            parquet_batch_writer(sink),
            ckpt,
            output_mode="append",
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    _copy_parts(h2_dir, src, "b")
    run_once()

    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.read.parquet(sink).collect()
    }
    assert got, "no windows finalized"
    # every emitted window must carry the full-input count (fragments
    # from a reset state store would undercount boundary windows) ...
    for key, n in got.items():
        assert expected.get(key) == n, (key, n, expected.get(key))
    # ... and every window that provably finalized must be present,
    # including the ones straddling the restart split
    from datetime import timedelta

    surely_final = {
        k for k in expected
        # window_end = start + 1h; finalized when watermark (max_ts-1h)
        # passes it, with an extra hour of margin for the boundary
        if k[0] + timedelta(hours=1) < max_ts - timedelta(hours=2)
    }
    missing = surely_final - set(got)
    assert not missing, sorted(missing)[:5]


def test_stream_upsert_converges_to_batch_state(spark, events_dir, tmp_path):
    """e9: replay events as MANY micro-batches (one file per trigger,
    deliberately not in event-time order) through the foreachBatch
    keyed merge; the parquet state must converge to exactly the batch
    latest-per-user materialization — proving the upsert winner is
    decided by (ts, event_id), not arrival order."""
    import shutil as _sh

    from hive_to_es_spark.streaming.ops import (
        foreach_batch_upsert,
        tf_latest_per_user,
    )

    batch_df = spark.read.parquet(events_dir)
    expected = _canon(tf_latest_per_user(batch_df).collect())

    # re-write as 8 files so AvailableNow + maxFilesPerTrigger=1
    # yields 8 separate merges
    multi = str(tmp_path / "events_multi")
    batch_df.repartition(8).write.mode("overwrite").parquet(multi)

    state = str(tmp_path / "state")
    src = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi)
    )
    q = (
        src.writeStream.foreachBatch(foreach_batch_upsert(state))
        .option("checkpointLocation", str(tmp_path / "ckpt_upsert"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    got = _canon(
        spark.read.parquet(state)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.round("value", 2).alias("last_value"),
        )
        .collect()
    )
    assert got == expected
    _sh.rmtree(state, ignore_errors=True)


def test_watermark_drops_exactly_the_beyond_horizon_rows(spark, tmp_path):
    """Exact late-drop accounting for e4 (its oracle is rows-only by
    design — watermark semantics exist only in stream mode). Three
    AvailableNow runs share one checkpoint, so the event-time
    watermark PERSISTS and advances between micro-batches:

      run 1 (on-time file): rows at 10:05, 10:45, 11:05, 12:05 ->
        watermark ends at 11:05 (max ts - 1h).
      run 2 (late file): 09:30 is BEYOND the horizon (its window
        [09:00, 10:00) closed below the 11:05 watermark) -> must be
        DROPPED; 11:30 is late in arrival order but within the
        horizon -> must be COUNTED.
      run 3 (fresh 14:05 row): advances the watermark to 13:05 so the
        11:00 and 12:00 windows finalize and append-emit.

    The accounting is exact, not a row-count smoke: the 09:00 window
    must NEVER appear anywhere (the dropped row would be its only
    member), while the 11:00 window must count BOTH the on-time 11:05
    row and the late-but-in-horizon 11:30 row."""
    import datetime as dt

    src = str(tmp_path / "e4_src")
    ckpt = str(tmp_path / "e4_ckpt")
    schema = "ts timestamp, event_type string, value double"

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    def add_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = str(tmp_path / "e4_out")

    def run():
        # memory sink refuses checkpoint recovery, so the emitted
        # windows append to parquet via foreachBatch (the e9 pattern)
        stream = spark.readStream.schema(schema).parquet(src)

        def emit(batch_df, batch_id):
            if batch_df.count() > 0:
                batch_df.write.mode("append").parquet(out)

        q = (
            tf_watermark_tumbling(stream)
            .writeStream.foreachBatch(emit)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    add_file([
        (t(10, 5), "click", 1.0),
        (t(10, 45), "click", 1.0),
        (t(11, 5), "click", 1.0),
        (t(12, 5), "click", 1.0),
    ])
    run()
    add_file([(t(9, 30), "click", 1.0), (t(11, 30), "click", 1.0)])
    run()
    add_file([(t(14, 5), "click", 1.0)])
    run()

    emitted = spark.read.parquet(out).collect()
    assert len(emitted) == len({r.window_start for r in emitted}), (
        "append mode must emit each finalized window exactly once"
    )
    final = {r.window_start: r.n for r in emitted}
    assert t(9, 0) not in final, "beyond-horizon late row was NOT dropped"
    assert final[t(10, 0)] == 2  # the two on-time rows only
    assert final[t(11, 0)] == 2  # on-time 11:05 + within-horizon late 11:30
    assert final[t(12, 0)] == 1


def test_stream_dedup_ingest_converges_to_batch_answer(spark, sf_dir, tmp_path):
    """Streaming corpus ingestion with cross-batch content-hash dedup
    must converge to the BATCH dedup answer (d1's keep-min-doc_id
    semantics) under at-least-once redelivery (VERDICT r6 task 5).

    The documents table is re-written as 5 files, then 3 of them are
    COPIED BACK IN under new names — a replayed, duplicated file
    sequence (8 micro-batches at maxFilesPerTrigger=1, ~60% of the
    corpus delivered twice). The final accepted state must equal,
    row for row, the batch answer computed directly from the unique
    source: one row per distinct md5(lower(text)) carrying the MIN
    doc_id — a pure function of the key set, so redelivery count and
    batch order cannot perturb it."""
    import os

    from pyspark.sql import Window

    from hive_to_es_spark.io import read_table
    from hive_to_es_spark.streaming.ops import foreach_batch_dedup_ingest

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    src = str(tmp_path / "docs_stream")
    docs.repartition(5).write.mode("overwrite").parquet(src)
    parts = [f for f in os.listdir(src) if f.endswith(".parquet")]
    assert len(parts) == 5
    for f in parts[:3]:  # at-least-once: redeliver 3 of the 5 files
        shutil.copy(os.path.join(src, f), os.path.join(src, f"redelivered_{f}"))

    state = str(tmp_path / "dedup_state")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_dedup_ingest(state))
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    w = Window.partitionBy("content_hash").orderBy("doc_id")
    expected = _canon(
        docs.select("doc_id", F.md5(F.lower("text")).alias("content_hash"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("content_hash", "doc_id")
        .collect()
    )
    got = _canon(spark.read.parquet(state).select("content_hash", "doc_id").collect())
    assert got == expected
    # and the dedup really had work to do: the redelivered files mean
    # more rows were DELIVERED than distinct hashes survive (at sf0.01
    # the corpus itself is dup-free, so the duplicate mass is exactly
    # the replayed ~60%)
    n_delivered = spark.read.parquet(src).count()
    assert n_delivered > docs.count() >= len(expected)


def test_stream_funnel_converges_to_batch_answer(spark, sf_dir, tmp_path):
    """The streaming funnel sink must converge to w13's BATCH answer
    under event-time-ordered delivery with an at-least-once replay:
    events are split into 6 time-ranged files streamed oldest-first
    (maxFilesPerTrigger=1), then one mid-sequence file is redelivered
    at the end. Per-user confirmed (t_first_view, t_first_conv_click,
    t_first_conv_purchase) + derived stage must equal the batch
    operator row for row — cross-batch qualifications (click in a
    later file than its view, purchase later still) ride the 28 h
    buffer; the replayed old file must perturb nothing."""
    import os
    import time

    from hive_to_es_spark.io import read_table
    from hive_to_es_spark.operators.windows import funnel_stage_expr
    from hive_to_es_spark.registry import queries
    from hive_to_es_spark.streaming.ops import foreach_batch_funnel

    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    n = ev.count()
    w = Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    sliced = ev.withColumn("bucket", ((F.row_number().over(w) - 1) * 6 / n).cast("int"))

    src = str(tmp_path / "events_stream")
    os.makedirs(src)
    staging = str(tmp_path / "staging")
    for i in range(6):
        part_dir = os.path.join(staging, f"b{i}")
        (
            sliced.filter(F.col("bucket") == i)
            .select("event_id", "user_id", "ts", "event_type")
            .coalesce(1)
            .write.parquet(part_dir)
        )
        part = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        dst = os.path.join(src, f"{i:03d}.parquet")
        shutil.copy(os.path.join(part_dir, part), dst)
        # file source triggers oldest-mtime-first: pin strictly
        # increasing mtimes so delivery order IS event-time order
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    # at-least-once: replay file 2 AFTER everything else
    late = os.path.join(src, "zz_redelivered.parquet")
    shutil.copy(os.path.join(src, "002.parquet"), late)
    os.utime(late, (1_700_000_000 + 6 * 10, 1_700_000_000 + 6 * 10))

    state = str(tmp_path / "funnel_state")
    schema = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_funnel(state))
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    got = _canon(
        spark.read.parquet(f"{state}/confirmed")
        .select(
            "user_id",
            "t_first_view",
            "t_first_conv_click",
            "t_first_conv_purchase",
            funnel_stage_expr().alias("funnel_stage"),
        )
        .collect()
    )
    expected = _canon(queries()["w13_funnel"](spark, sf_dir).collect())
    assert got == expected
    # the convergence had cross-batch work to do: at least one user's
    # conversion pair spans two stream files (click file > view file)
    by_bucket = {
        r.event_id: r.bucket for r in sliced.select("event_id", "bucket").collect()
    }
    assert len(set(by_bucket.values())) == 6


def test_stream_neardup_ingest_converges_to_batch_answer(spark, sf_dir, tmp_path):
    """The streaming NEAR-dup ingest must converge to e11's batch
    answer (accepted iff no smaller-id near-dup at exact Jaccard >=
    0.2) under in-order, at-least-once delivery: documents split into
    5 doc_id-ranged files streamed oldest-first (maxFilesPerTrigger=1),
    with file 1 REDELIVERED at the end. The final survivors state must
    equal the batch op's accepted set exactly — cross-batch dups (a
    doc whose near-dup partner arrived in an earlier file) ride the
    persisted index; the replayed file must perturb nothing (its ids
    are already in the seen state)."""
    import os

    from hive_to_es_spark.io import read_table
    from hive_to_es_spark.registry import queries
    from hive_to_es_spark.streaming.ops import foreach_batch_neardup_ingest

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    from pyspark.sql import Window

    w = Window.orderBy(F.col("doc_id").asc())
    sliced = docs.withColumn(
        "bucket", ((F.row_number().over(w) - 1) * 5 / n).cast("int")
    )
    src = str(tmp_path / "neardup_stream")
    os.makedirs(src)
    staging = str(tmp_path / "nd_staging")
    for i in range(5):
        part_dir = os.path.join(staging, f"b{i}")
        (
            sliced.filter(F.col("bucket") == i)
            .select("doc_id", "text")
            .coalesce(1)
            .write.parquet(part_dir)
        )
        part = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        dst = os.path.join(src, f"{i:03d}.parquet")
        shutil.copy(os.path.join(part_dir, part), dst)
        # file source triggers oldest-mtime-first: pin strictly
        # increasing mtimes so delivery order IS doc_id order
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    late = os.path.join(src, "zz_redelivered.parquet")
    shutil.copy(os.path.join(src, "001.parquet"), late)
    os.utime(late, (1_700_000_000 + 5 * 10, 1_700_000_000 + 5 * 10))

    state = str(tmp_path / "neardup_state")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_neardup_ingest(state))
        .option("checkpointLocation", str(tmp_path / "ckpt_neardup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    got = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{state}/survivors").distinct().collect()
    )
    batch = queries()["e11_stream_neardup_ingest"](spark, sf_dir).collect()
    expected = sorted(r.doc_id for r in batch if r.accepted == 1)
    assert got == expected
    # the fold had cross-batch work: at least one rejected doc's
    # earliest partner sits in a DIFFERENT file than the doc itself
    bucket_of = {r.doc_id: r.bucket for r in sliced.select("doc_id", "bucket").collect()}
    cross = [
        r for r in batch
        if r.accepted == 0 and bucket_of[r.dup_of] != bucket_of[r.doc_id]
    ]
    assert cross, "fixture must contain a cross-file near-dup pair"
    # and redelivery really delivered duplicates
    assert spark.read.parquet(src).count() > n


def test_e12_session_metrics_late_event_dropped(spark, tmp_path):
    """e12's stream contract on a replayed file sequence: a session
    finalized by the watermark is emitted ONCE, and a late event
    replayed behind the watermark is DROPPED instead of reopening it
    — while a batch run over the same accumulated files (the control)
    absorbs the late event into a bigger session. This is the
    watermark-driven state eviction e4 asserts for tumbling windows,
    on session state."""
    import os

    from hive_to_es_spark.streaming.ops import tf_watermark_session_metrics
    from hive_to_es_spark.streaming.sink import (
        parquet_batch_writer,
        start_foreach_batch,
    )

    schema = "user_id LONG, ts STRING, value DOUBLE"
    d = "2024-01-01 "
    file_a = spark.createDataFrame(
        [
            (1, d + "00:00:00", 10.0),
            (1, d + "00:10:00", 20.0),  # user 1: session [00:00, 00:40)
            (2, d + "03:00:00", 5.0),  # clock events: push watermark to 02:05
            (2, d + "03:05:00", 5.0),
        ],
        schema,
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "value")
    # LATE: inside user 1's finalized session, far behind the watermark
    file_b = spark.createDataFrame([(1, d + "00:20:00", 99.0)], schema).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) ts", "value"
    )
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    file_a.coalesce(1).write.parquet(a_dir)
    file_b.coalesce(1).write.parquet(b_dir)
    os.makedirs(src, exist_ok=True)
    ts_schema = spark.read.parquet(a_dir).schema

    def run_once():
        stream = spark.readStream.schema(ts_schema).parquet(src)
        q = start_foreach_batch(
            tf_watermark_session_metrics(stream),
            parquet_batch_writer(sink),
            ckpt,
            output_mode="append",
        )
        q.awaitTermination(120)
        q.stop()

    _copy_parts(a_dir, src, "a")
    run_once()
    got1 = {
        (r.user_id, r.session_start): (r.n_events, r.total_cents)
        for r in spark.read.parquet(sink).collect()
    }
    # user 1's session finalized and emitted once; user 2's still open
    from datetime import datetime

    k1 = (1, datetime(2024, 1, 1, 0, 0))
    assert got1 == {k1: (2, 3000)}, got1

    _copy_parts(b_dir, src, "b")
    run_once()
    got2 = {
        (r.user_id, r.session_start): (r.n_events, r.total_cents)
        for r in spark.read.parquet(sink).collect()
    }
    # the late event was dropped: no re-emission, no mutated session
    assert got2 == got1, got2
    # control: batch over the SAME accumulated files absorbs it
    batch = tf_watermark_session_metrics(spark.read.parquet(src))
    b1 = {
        (r.user_id, r.session_start): (r.n_events, r.total_cents)
        for r in batch.collect()
    }
    assert b1[k1] == (3, 12900), b1


def test_decontaminate_gate_stream_equals_batch(spark, sf_dir, tmp_path):
    """e13: the decontamination gate over readStream via foreachBatch
    (within-batch groupBy against the broadcast eval shingles — no
    state store, no watermark, each doc decided in its arrival batch)
    must emit exactly the batch twin's rows, and both actions must
    actually occur."""
    from hive_to_es_spark.streaming.ops import (
        e13_eval_shingles,
        tf_decontaminate_counts,
    )

    docs_dir = str(tmp_path / "docs")
    read_table(spark, sf_dir, "documents").write.mode("overwrite").parquet(docs_dir)
    batch_docs = spark.read.parquet(docs_dir)
    eval_sh = e13_eval_shingles(batch_docs)
    corpus = batch_docs.filter(F.col("doc_id") % 29 != 0)
    expected = _canon(tf_decontaminate_counts(corpus, eval_sh).collect())
    stream_src = (
        spark.readStream.schema(batch_docs.schema)
        .parquet(docs_dir)
        .filter(F.col("doc_id") % 29 != 0)
    )
    sink = str(tmp_path / "gate_out")
    q = (
        stream_src.writeStream.foreachBatch(
            lambda bdf, _bid: tf_decontaminate_counts(bdf, eval_sh)
            .write.mode("append")
            .parquet(sink)
        )
        .option("checkpointLocation", str(tmp_path / "gate_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = _canon(spark.read.parquet(sink).collect())
    assert got == expected
    actions = {r[2] for r in got}
    assert actions == {"pass", "block"}, f"gate unexercised: {actions}"


def test_e14_within_watermark_dedup_drop_evict_reemit(spark, tmp_path):
    """dropDuplicatesWithinWatermark end to end across three
    checkpointed AvailableNow replays (the e4 pattern — the event-time
    watermark persists and advances between runs):

      run 1: A@10:00, B@10:05 -> both first occurrences, EMITTED;
        watermark ends at 9:05 (max ts - 1h).
      run 2: A@10:10 (duplicate while A's state entry — expiring at
        11:00 — is still live) -> DROPPED; C@12:30 advances the
        watermark to 11:30, past A's and B's expiry -> both EVICTED.
      run 3: A@12:00 arrives after eviction -> treated as new,
        EMITTED AGAIN (the bounded-state arm e5's dropDuplicates can
        never show: its state would still remember A).

    And the replay satisfies the batch-twin contract's premise (every
    beyond-horizon redelivery arrives after the watermark passed the
    expiry), so the streamed output must equal dedup_within_horizon
    over the union of all three files — stream == batch where the
    contract allows."""
    import datetime as dt

    from hive_to_es_spark.streaming.ops import (
        dedup_within_horizon,
        tf_dedup_within_watermark,
    )

    src = str(tmp_path / "e14_src")
    ckpt = str(tmp_path / "e14_ckpt")
    out = str(tmp_path / "e14_out")
    schema = "event_id long, ts timestamp, value double"

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    def add_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)

        def emit(batch_df, batch_id):
            if batch_df.count() > 0:
                batch_df.write.mode("append").parquet(out)

        q = (
            tf_dedup_within_watermark(stream)
            .writeStream.foreachBatch(emit)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    add_file([(1, t(10, 0), 1.0), (2, t(10, 5), 2.0)])
    run()
    add_file([(1, t(10, 10), 1.0), (3, t(12, 30), 3.0)])
    run()
    add_file([(1, t(12, 0), 1.0)])
    run()

    got = sorted((r.event_id, r.ts) for r in spark.read.parquet(out).collect())
    assert got == [
        (1, t(10, 0)),   # first occurrence
        (1, t(12, 0)),   # re-emitted AFTER eviction
        (2, t(10, 5)),
        (3, t(12, 30)),
    ], got
    assert (1, t(10, 10)) not in got  # within-horizon duplicate dropped

    # stream == batch twin on the same replayed rows
    batch = dedup_within_horizon(spark.read.parquet(src))
    expect = sorted((r.event_id, r.ts) for r in batch.collect())
    assert got == expect
