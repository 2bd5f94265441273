"""Timer-semantics ports: W4 early firing, T5 late capture (streaming/
timers.py, runnable anywhere) and their transformWithStateInPandas
twins (streaming/tws.py, skipped where protobuf is unavailable)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from examples_scala_spark.streaming import timers, tws


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sgs_tws_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _staged_stream(spark, tmpdir, batches):
    """One parquet file per batch + maxFilesPerTrigger=1 → one
    micro-batch per element of `batches` (watermark advances between)."""
    path = os.path.join(tmpdir, "in")
    os.makedirs(path, exist_ok=True)
    for rows in batches:
        spark.createDataFrame(rows, ["id", "timestamp", "temperature"]) \
            .coalesce(1).write.mode("append").parquet(path)
    return (
        spark.readStream.schema("id string, timestamp long, temperature double")
        .option("maxFilesPerTrigger", 1).parquet(path)
    )


def _run(stream_df, tmpdir, name):
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


def test_early_firing_window_fire_and_purge(spark, tmpdir):
    # 30 s window [0, 30000); batch 1 puts 3 rows in it (max ts 27000
    # → watermark 22000 for batch 2); batch 2's row at ts=40000 lifts
    # the watermark to 35000 > window end → final fire + purge in
    # batch 3.
    stream = _staged_stream(spark, tmpdir, [
        [("s1", 1_000, 1.0), ("s1", 5_000, 2.0), ("s1", 27_000, 3.0)],
        [("s1", 40_000, 4.0)],
        [("s1", 80_000, 5.0)],
    ])
    out = timers.early_firing_window_counts(stream, window_ms=30_000,
                                            interval_ms=1_000)
    _run(out, tmpdir, "early_firing")
    rows = spark.sql(
        "SELECT * FROM early_firing ORDER BY fire_ms, window_start").collect()
    w0 = [r for r in rows if r.window_start == 0]
    partials = [r for r in w0 if not r.is_final]
    finals = [r for r in w0 if r.is_final]
    # early fires emitted partial counts before the window closed,
    # stamped with the due event-time tick (not processing time)
    assert partials and all(r.cnt == 3 for r in partials)
    assert all(r.fire_ms % 1_000 == 0 and r.fire_ms < 30_000
               for r in partials)
    # exactly one FIRE_AND_PURGE with the full count at window end
    assert [(r.cnt, r.fire_ms) for r in finals] == [(3, 30_000)]


def test_early_firing_closes_window_without_new_key_data(spark, tmpdir):
    # s2's window [0,30000) gets data only in batch 1; the watermark
    # advance comes from s1's rows — the re-armed event-time timeout
    # must still final-fire s2's window (the per-window end timer).
    stream = _staged_stream(spark, tmpdir, [
        [("s2", 2_000, 1.0), ("s2", 3_000, 1.0), ("s1", 1_000, 1.0)],
        [("s1", 50_000, 2.0)],
        [("s1", 99_000, 3.0)],
    ])
    out = timers.early_firing_window_counts(stream, window_ms=30_000,
                                            interval_ms=1_000)
    _run(out, tmpdir, "early_firing_timer")
    finals = [r for r in spark.sql(
        "SELECT * FROM early_firing_timer").collect()
        if r.is_final and r.id == "s2"]
    assert [(r.window_start, r.cnt) for r in finals] == [(0, 2)]


def test_late_rows_tagged_not_dropped(spark, tmpdir):
    # batch 1 lifts the watermark to 55000 (60000 - 5 s delay);
    # batch 2 delivers ts=10000 (< wm → late) and ts=70000 (on time).
    stream = _staged_stream(spark, tmpdir, [
        [("s1", 60_000, 1.0)],
        [("s1", 10_000, 2.0), ("s1", 70_000, 3.0)],
    ])
    out = timers.tag_late_rows(stream, watermark_delay="5 seconds")
    _run(out, tmpdir, "late_tagged")
    rows = {r.timestamp: r.is_late
            for r in spark.sql("SELECT * FROM late_tagged").collect()}
    assert rows[10_000] is True      # captured AND tagged, not dropped
    assert rows[70_000] is False
    assert rows[60_000] is False     # first batch: watermark still 0


# ---------------------------------------------------------------
# transformWithStateInPandas twins — need protobuf (real clusters)
# ---------------------------------------------------------------

needs_tws = pytest.mark.skipif(
    not tws.HAS_PROTOBUF,
    reason="transformWithStateInPandas state server needs protobuf")


@needs_tws
def test_tws_ttl_delta_alerts(spark, tmpdir):
    tws.enable_tws(spark)
    stream = _staged_stream(spark, tmpdir, [
        [("s1", 1, 10.0), ("s1", 2, 10.5), ("s1", 3, 20.0),
         ("s2", 1, 5.0), ("s2", 2, 5.1)],
    ])
    out = tws.ttl_delta_alerts(stream, threshold=1.7, ttl_ms=3_600_000)
    _run(out, tmpdir, "ttl_alerts")
    got = [(r.id, r.temperature, round(r.diff, 3))
           for r in spark.sql("SELECT * FROM ttl_alerts").collect()]
    assert got == [("s1", 20.0, 9.5)]


@needs_tws
def test_tws_rise_warning_timer_register_and_delete(spark, tmpdir):
    tws.enable_tws(spark)
    stream = _staged_stream(spark, tmpdir, [
        [("s1", 1, 10.0), ("s1", 2, 11.0), ("s2", 1, 10.0),
         ("s2", 2, 11.0), ("s2", 3, 9.0)],
        [("s1", 3, 12.0)],
        [("s1", 4, 13.0)],
    ])
    out = tws.temperature_rise_warnings_tws(stream, rise_ms=1)
    _run(out, tmpdir, "rise_tws")
    got = {r.id for r in spark.sql("SELECT * FROM rise_tws").collect()}
    assert "s1" in got and "s2" not in got


@needs_tws
def test_tws_late_rows_tagged_not_dropped(spark, tmpdir):
    # the TWS twin of timers.tag_late_rows: timeMode='processingTime'
    # (r12 fix) — 'eventTime' mode late-record-filters the rows this
    # operator exists to TAG before handleInputRows (r11 find), and
    # 'none' (the r11 choice) makes get_timestamps() hard-return
    # (-1, -1) so is_late would always be False (r12 ADVICE find);
    # processingTime keeps late filtering off while the real event-time
    # watermark is still fetched from the JVM
    tws.enable_tws(spark)
    stream = _staged_stream(spark, tmpdir, [
        [("s1", 60_000, 1.0)],
        [("s1", 10_000, 2.0), ("s1", 70_000, 3.0)],
    ])
    out = tws.tag_late_rows(stream, watermark_delay="5 seconds")
    _run(out, tmpdir, "late_tws")
    rows = {r.timestamp: r.is_late
            for r in spark.sql("SELECT * FROM late_tws").collect()}
    assert rows[10_000] is True      # captured AND tagged, not dropped
    assert rows[70_000] is False


@needs_tws
def test_tws_early_firing(spark, tmpdir):
    tws.enable_tws(spark)
    stream = _staged_stream(spark, tmpdir, [
        [("s1", 1_000, 1.0), ("s1", 5_000, 2.0), ("s1", 27_000, 3.0)],
        [("s1", 40_000, 4.0)],
        [("s1", 80_000, 5.0)],
    ])
    out = tws.early_firing_window_counts(stream, window_ms=30_000,
                                         interval_ms=1_000)
    _run(out, tmpdir, "early_tws")
    rows = spark.sql("SELECT * FROM early_tws").collect()
    finals = [r for r in rows if r.is_final and r.window_start == 0]
    assert len(finals) == 1 and finals[0].cnt == 3


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              # >= 1: with EventTimeTimeout, SS pre-filters rows not
              # newer than the watermark — an epoch-0 row at the
              # initial watermark 0 is dropped as late (the same
              # drop-late default as the reference's window operator)
              st.integers(min_value=1, max_value=100_000)),
    min_size=1, max_size=50))
def test_early_firing_finals_equal_batch_window_counts(spark, rows):
    """Property: once the watermark passes every window, the timer
    path's FIRE_AND_PURGE counts must equal a plain batch
    groupBy(window) — the two implementations of the same semantics
    cross-check each other on arbitrary event sequences. All rows
    arrive in one batch (watermark 0), so none are dropped as late."""
    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="sgs_prop_")
    try:
        path = os.path.join(d, "in")
        batches = [
            [(i, t, 0.0) for i, t in rows],
            [("z", 10_000_000, 0.0)],   # lifts watermark past all windows
            [("z", 20_000_000, 0.0)],   # lets the final-fire batch run
        ]
        for b in batches:
            spark.createDataFrame(b, "id string, timestamp long, temperature double") \
                .coalesce(1).write.mode("append").parquet(path)
        stream = (spark.readStream
                  .schema("id string, timestamp long, temperature double")
                  .option("maxFilesPerTrigger", 1).parquet(path))
        out = timers.early_firing_window_counts(stream, window_ms=30_000,
                                                interval_ms=1_000)
        q = (out.writeStream.format("memory").queryName("prop_ef")
             .outputMode("append")
             .option("checkpointLocation", os.path.join(d, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        finals = {(r.id, r.window_start): r.cnt for r in spark.sql(
            "SELECT * FROM prop_ef WHERE is_final AND id != 'z'").collect()}
        expected = {}
        for i, t in rows:
            k = (i, t - t % 30_000)
            expected[k] = expected.get(k, 0) + 1
        assert finals == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.catalog.dropTempView("prop_ef")


def test_updating_window_counts_first_then_update(spark, tmpdir):
    """T7: window [0,10000) fires 'first' when the reference watermark
    (SS wm + lateness) passes 10000, then a late row within lateness
    re-fires it tagged 'update' with the corrected count.

    Watermark delay = disorder 5 s + lateness 5 s = 10 s. SS's late
    filter uses the PREVIOUS batch's watermark, so the staging keeps
    wm below the late row's ts until after the first fire."""
    stream = _staged_stream(spark, tmpdir, [
        [("s1", 1_000, 1.0), ("s1", 9_000, 2.0)],   # window 0: cnt 2; wm->0
        [("s1", 16_000, 3.0)],   # during: wm 0 (no fire); after: wm 6000
        [("s1", 17_500, 4.0)],   # during: wm 6000 -> ref wm 11000 >= end
                                 # -> FIRST fire cnt 2; after: wm 7500
        [("s1", 9_500, 5.0),     # late (ref wm 12500 > end) but within
                                 # lateness and >= prev wm -> UPDATE cnt 3
         ("s1", 18_000, 6.0)],
    ])
    out = timers.updating_window_counts_stream(
        stream, window_ms=10_000, disorder="5 seconds", lateness_ms=5_000)
    _run(out, tmpdir, "upd_windows")
    rows = [(r.window_start, r.cnt, r.tag) for r in spark.sql(
        "SELECT * FROM upd_windows WHERE id='s1' AND window_start=0"
    ).collect()]
    assert (0, 2, "first") in rows
    assert (0, 3, "update") in rows
    assert len([r for r in rows if r[2] == "first"]) == 1


def test_early_firing_state_survives_restart(spark, tmpdir):
    """Recovery (R4/R5 for the timer operator): stop the query after
    the first batches, add more data, restart from the SAME checkpoint
    — window counts and the re-armed timer must come back from the
    state store and produce the same final fire as an uninterrupted
    run."""
    path = os.path.join(tmpdir, "in")
    ckpt = os.path.join(tmpdir, "ckpt_restart")
    got: list = []

    def collect_rows(batch_df, batch_id):
        got.extend(tuple(r) for r in batch_df.collect())

    def start():
        stream = (spark.readStream
                  .schema("id string, timestamp long, temperature double")
                  .option("maxFilesPerTrigger", 1).parquet(path))
        out = timers.early_firing_window_counts(stream, window_ms=30_000,
                                                interval_ms=1_000)
        return (out.writeStream.foreachBatch(collect_rows)
                .outputMode("append").option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())

    # run 1: two batches fill window [0, 30000) — no final fire yet
    for rows in [[("s1", 1_000, 1.0), ("s1", 5_000, 2.0)],
                 [("s1", 27_000, 3.0)]]:
        spark.createDataFrame(rows, "id string, timestamp long, temperature double") \
            .coalesce(1).write.mode("append").parquet(path)
    q = start()
    q.awaitTermination(120)
    assert not [r for r in got if r[5]]  # no finals yet

    # run 2 (fresh query, same checkpoint): watermark passes the window
    for rows in [[("s1", 40_000, 4.0)], [("s1", 80_000, 5.0)]]:
        spark.createDataFrame(rows, "id string, timestamp long, temperature double") \
            .coalesce(1).write.mode("append").parquet(path)
    q = start()
    q.awaitTermination(120)
    finals = [r for r in got if r[5] and r[1] == 0]
    # (id, window_start, window_end, fire_ms, cnt, is_final); the count
    # includes the two pre-restart rows recovered from the state store
    assert [(r[4], r[3]) for r in finals] == [(3, 30_000)]


@needs_tws
def test_tws_per_window_early_firing(spark, tmpdir):
    tws.enable_tws(spark)
    stream = _staged_stream(spark, tmpdir, [
        [("s1", 1_000, 1.0), ("s1", 5_000, 2.0), ("s1", 27_000, 3.0)],
        [("s1", 40_000, 4.0)],
        [("s1", 80_000, 5.0)],
    ])
    out = tws.per_window_early_firing_counts(stream, window_ms=30_000,
                                             interval_ms=1_000)
    _run(out, tmpdir, "early_perw_tws")
    rows = spark.sql("SELECT * FROM early_perw_tws").collect()
    w0 = [r for r in rows if r.window_start == 0]
    finals = [r for r in w0 if r.is_final]
    partials = [r for r in w0 if not r.is_final]
    # exactly one FIRE_AND_PURGE, stamped at the window end
    assert [(r.cnt, r.fire_ms) for r in finals] == [(3, 30_000)]
    # every partial fire is an interval tick strictly inside the window
    assert all(0 < r.fire_ms < 30_000 and r.fire_ms % 1_000 == 0
               for r in partials)
    # window [30000,60000) holds the ts=40000 row and also finalizes
    w1_finals = [r for r in rows if r.window_start == 30_000 and r.is_final]
    assert [(r.cnt, r.fire_ms) for r in w1_finals] == [(1, 60_000)]


def test_per_window_timer_attribution_arithmetic():
    # the arithmetic that replaces a timer->window MapState: ticks are
    # strictly inside a window, boundaries are end timers.
    p = tws.PerWindowEarlyFiringCounter(window_ms=30_000, interval_ms=1_000)
    # first tick after the watermark, clipped to the window
    assert p._first_tick(0, 0) == 1_000
    assert p._first_tick(0, 14_500) == 15_000
    assert p._first_tick(0, 29_000) is None      # next tick would be >= end
    assert p._first_tick(30_000, 0) == 31_000    # window not yet reached
    # boundary timestamps attribute to the ENDING window, not a tick
    assert 30_000 % p.window_ms == 0
    assert 29_000 - 29_000 % p.window_ms == 0    # tick inside [0, 30000)
    assert 31_000 - 31_000 % p.window_ms == 30_000
