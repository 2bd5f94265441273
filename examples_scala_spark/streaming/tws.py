"""Exact ports of the reference's timer-driven semantics on Spark 4's
``transformWithStateInPandas`` (StatefulProcessor: real named timers,
watermark introspection, native state TTL).

These close the gaps documented in COVERAGE.md that the
``applyInPandasWithState`` ports (streaming/stateful.py) could only
approximate:

- W4 early-firing event-time trigger (chapter6/CustomWindow.scala:87-148,
  OneSecondIntervalTrigger): real per-key event-time timers fire partial
  window results every interval, then FIRE_AND_PURGE at window end.
- F1 processing-time timer register/delete
  (chapter6/ProcessFunctionTimers.scala:42-97): `registerTimer` /
  `deleteTimer` are now literal, not emulated via a single group timeout.
- F4 state TTL (chapter7/StatefulProcessFunction.scala:56-110): native
  `ValueState(ttlDurationMs=...)` — the state store expires the entry
  itself, no hand-rolled cleanup timer.
- T5/T6 row-level late capture (chapter6/LateDataHandling.scala:60-76):
  `timerValues.getCurrentWatermarkInMs()` is the reference's
  `ctx.timerService.currentWatermark()` — rows are tagged late
  per-record, reproducing the side-output split.
- W6 watermark introspection (chapter6/CustomWindow.scala:163-166): the
  current watermark is emitted in the early-firing results.

Scale notes: state is keyed and lives in per-partition RocksDB state
stores (provider set by `enable_tws`); the groupBy declares the same
hash partitioning the reference's keyBy does. Rows cross JVM<->Python
as Arrow batches. Timer state is per (key, timestamp) in the store —
no driver-side anything.

AVAILABILITY: transformWithStateInPandas's Python state server speaks
protobuf; environments without `google.protobuf` (such as this test
container) cannot run it — `require_tws()` raises a clear error and
tests skip. The SAME semantics are implemented on
`applyInPandasWithState` (no protobuf needed) in streaming/timers.py,
which is what the query registry uses; this module is the
forward-looking Spark 4 surface for clusters with protobuf.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo, TimerValues,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

try:  # the TWS state-server protocol needs protobuf
    import google.protobuf  # noqa: F401
    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False


def require_tws() -> None:
    if not HAS_PROTOBUF:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(pyspark[connect] / protobuf); use "
            "examples_scala_spark.streaming.timers for the equivalent "
            "applyInPandasWithState implementations.")


def enable_tws(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB state store provider
    (also the right choice at scale: state >> executor heap)."""
    require_tws()
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)


# --------------------------------------------------------------------
# W4 — early-firing event-time window counter
# --------------------------------------------------------------------

EARLY_FIRING_SCHEMA = (
    "id string, window_start long, window_end long, fire_ms long, "
    "cnt long, is_final boolean"
)


class EarlyFiringWindowCounter(StatefulProcessor):
    """W4+A9+W6 — 30 s tumbling count windows per key that FIRE a
    partial result every `interval_ms` of *event time* and
    FIRE_AND_PURGE at window end (chapter6/CustomWindow.scala:87-148).

    State: MapState[window_start -> running count]. Timers: one
    event-time timer per interval tick (shared by all open windows of
    the key) plus one per window end. `fire_ms` carries the timer
    timestamp (== the watermark position that fired it, the reference's
    `ctx.currentWatermark`)."""

    def __init__(self, window_ms: int = 30_000, interval_ms: int = 1_000):
        self.window_ms = window_ms
        self.interval_ms = interval_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.counts = handle.getMapState(
            "counts", "start long", "cnt long")

    def handleInputRows(self, key: Tuple[str], rows: Iterator[pd.DataFrame],
                        timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        wm = timerValues.getCurrentWatermarkInMs()
        for pdf in rows:
            starts = (pdf["timestamp"] - (pdf["timestamp"] % self.window_ms))
            for start, n in starts.value_counts().items():
                start = int(start)
                prev = (self.counts.getValue((start,))[0]
                        if self.counts.containsKey((start,)) else 0)
                if prev == 0:
                    # first element of this window (firstSeen ValueState
                    # in the reference): arm the end-of-window timer and
                    # the next interval tick past max(window start,
                    # watermark). Anchoring at the WINDOW START matters
                    # on the first batch, where wm == 0 with real
                    # epoch-ms event times: an absolute tick at
                    # interval_ms (the old wm-anchored form) is ~50
                    # years overdue, fires a bogus partial every batch,
                    # and the one-interval re-arm never catches up to
                    # the watermark (r11 review find; same anchoring as
                    # the per-window variant's _first_tick)
                    self.handle.registerTimer(start + self.window_ms)
                    base = max(start, wm)
                    tick = base - base % self.interval_ms + self.interval_ms
                    self.handle.registerTimer(tick)
                self.counts.updateValue((start,), (prev + int(n),))
        return iter(())

    def handleExpiredTimer(self, key: Tuple[str], timerValues: TimerValues,
                           expiredTimerInfo: ExpiredTimerInfo
                           ) -> Iterator[pd.DataFrame]:
        t = expiredTimerInfo.getExpiryTimeInMs()
        (sensor_id,) = key
        out: list[tuple] = []
        any_open = False
        for (start,) in list(self.counts.keys()):
            start = int(start)
            end = start + self.window_ms
            cnt = int(self.counts.getValue((start,))[0])
            if t >= end:
                out.append((sensor_id, start, end, t, cnt, True))
                self.counts.removeKey((start,))  # FIRE_AND_PURGE
            else:
                out.append((sensor_id, start, end, t, cnt, False))  # FIRE
                any_open = True
        if any_open and t % self.interval_ms == 0:
            self.handle.registerTimer(t + self.interval_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["id", "window_start", "window_end",
                              "fire_ms", "cnt", "is_final"])

    def close(self) -> None:
        pass


def early_firing_window_counts(readings: DataFrame,
                               window_ms: int = 30_000,
                               interval_ms: int = 1_000,
                               watermark_delay: str = "5 seconds") -> DataFrame:
    """readings: (id string, timestamp long event-ms, temperature double)."""
    wm = readings.withColumn(
        "event_time", F.timestamp_millis(F.col("timestamp"))
    ).withWatermark("event_time", watermark_delay)
    return wm.groupBy("id").transformWithStateInPandas(
        statefulProcessor=EarlyFiringWindowCounter(window_ms, interval_ms),
        outputStructType=EARLY_FIRING_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )


# --------------------------------------------------------------------
# F1 — exact processing-time timer register/delete
# --------------------------------------------------------------------

WARNING_SCHEMA = "id string, message string"


class TempIncreaseAlertProcessor(StatefulProcessor):
    """F1 — TempIncreaseAlertFunction
    (chapter6/ProcessFunctionTimers.scala:42-97), exact port: ValueState
    lastTemp + ValueState currentTimer; a processing-time timer is
    REGISTERED on the first rise and DELETED on any fall — the two
    operations the applyInPandasWithState port had to fold into one
    group timeout."""

    def __init__(self, rise_ms: int = 1_000):
        self.rise_ms = rise_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.last_temp = handle.getValueState("last_temp", "t double")
        self.timer_ts = handle.getValueState("timer_ts", "ts long")

    def handleInputRows(self, key: Tuple[str], rows: Iterator[pd.DataFrame],
                        timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        last = self.last_temp.get()[0] if self.last_temp.exists() else None
        armed = self.timer_ts.get()[0] if self.timer_ts.exists() else None
        now = timerValues.getCurrentProcessingTimeInMs()
        # concat-then-sort: chunks of one key's batch arrive unordered
        # (see streaming/stateful.py:ordered_batch)
        chunks = [p for p in rows if len(p)]
        batch = ([pd.concat(chunks, ignore_index=True)
                  .sort_values("timestamp", kind="mergesort")]
                 if chunks else [])
        for pdf in batch:
            for t in pdf["temperature"]:
                t = float(t)
                if last is not None and t > last and armed is None:
                    armed = now + self.rise_ms
                    self.handle.registerTimer(armed)       # :80-81
                    self.timer_ts.update((armed,))
                elif last is not None and t <= last and armed is not None:
                    self.handle.deleteTimer(armed)          # :74
                    self.timer_ts.clear()
                    armed = None
                last = t
        if last is not None:
            self.last_temp.update((last,))
        return iter(())

    def handleExpiredTimer(self, key: Tuple[str], timerValues: TimerValues,
                           expiredTimerInfo: ExpiredTimerInfo
                           ) -> Iterator[pd.DataFrame]:
        (sensor_id,) = key                                   # onTimer :87-96
        self.timer_ts.clear()
        yield pd.DataFrame({
            "id": [sensor_id],
            "message": [f"Temperature of sensor '{sensor_id}' monotonically "
                        f"increased for {self.rise_ms} ms."],
        })

    def close(self) -> None:
        pass


def temperature_rise_warnings_tws(readings: DataFrame,
                                  rise_ms: int = 1_000) -> DataFrame:
    return readings.groupBy("id").transformWithStateInPandas(
        statefulProcessor=TempIncreaseAlertProcessor(rise_ms),
        outputStructType=WARNING_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


# --------------------------------------------------------------------
# F4 — delta alerts with NATIVE state TTL
# --------------------------------------------------------------------

ALERT_SCHEMA = "id string, temperature double, diff double"


class TTLDeltaAlertProcessor(StatefulProcessor):
    """F4 — SelfCleaningTemperatureAlertFunction
    (chapter7/StatefulProcessFunction.scala:56-110) with the state store
    expiring the entry itself: `getValueState(ttlDurationMs=...)`
    replaces the reference's hand re-armed cleanup timer. Delta: native
    TTL is processing-time-based; the event-time-timer variant lives in
    streaming/stateful.py:self_cleaning_delta_alerts."""

    def __init__(self, threshold: float = 1.7, ttl_ms: int = 3_600_000):
        self.threshold = threshold
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.last_temp = handle.getValueState(
            "last_temp", "t double", ttlDurationMs=self.ttl_ms)

    def handleInputRows(self, key: Tuple[str], rows: Iterator[pd.DataFrame],
                        timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        (sensor_id,) = key
        last = self.last_temp.get()[0] if self.last_temp.exists() else None
        out_t, out_d = [], []
        chunks = [p for p in rows if len(p)]
        batch = ([pd.concat(chunks, ignore_index=True)
                  .sort_values("timestamp", kind="mergesort")]
                 if chunks else [])
        for pdf in batch:
            for t in pdf["temperature"]:
                t = float(t)
                if last is not None and abs(t - last) > self.threshold:
                    out_t.append(t)
                    out_d.append(t - last)
                last = t
        if last is not None:
            self.last_temp.update((last,))
        if out_t:
            yield pd.DataFrame({
                "id": [sensor_id] * len(out_t),
                "temperature": out_t,
                "diff": out_d,
            })

    def close(self) -> None:
        pass


def ttl_delta_alerts(readings: DataFrame, threshold: float = 1.7,
                     ttl_ms: int = 3_600_000) -> DataFrame:
    return readings.groupBy("id").transformWithStateInPandas(
        statefulProcessor=TTLDeltaAlertProcessor(threshold, ttl_ms),
        outputStructType=ALERT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


# --------------------------------------------------------------------
# T5/T6 — row-level late capture (side-output split)
# --------------------------------------------------------------------

TAGGED_SCHEMA = "id string, timestamp long, temperature double, is_late boolean"


class LateRowTagger(StatefulProcessor):
    """T5 — LateReadingsFilter (chapter6/LateDataHandling.scala:60-76):
    a row is late iff its event time < the current watermark; the
    reference routes late rows to a side output — here every row is
    emitted with an `is_late` tag and the two "outputs" are filter
    branches over one result (O1's DAG-reuse idiom). Stateless, but
    needs the stateful API for watermark access (W6)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        pass

    def handleInputRows(self, key: Tuple[str], rows: Iterator[pd.DataFrame],
                        timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        wm = timerValues.getCurrentWatermarkInMs()
        for pdf in rows:
            yield pd.DataFrame({
                "id": pdf["id"],
                "timestamp": pdf["timestamp"].astype("int64"),
                "temperature": pdf["temperature"],
                "is_late": pdf["timestamp"].astype("int64") < wm,
            })

    def close(self) -> None:
        pass


def tag_late_rows(readings: DataFrame,
                  watermark_delay: str = "5 seconds") -> DataFrame:
    """readings: (id, timestamp long event-ms, temperature). The
    watermark column drives `getCurrentWatermarkInMs`; rows older than
    the watermark at their batch are tagged late instead of dropped.

    timeMode is "processingTime", NOT "eventTime" and NOT "none"
    (r12 fix of an r11 fix): in event-time mode transformWithState
    applies late-record filtering — rows older than the watermark are
    dropped BEFORE handleInputRows, so the one thing this operator
    exists to do (tag them) could never happen. But "none" (the r11
    choice) is just as dead: pyspark 4.1.2's
    StatefulProcessorApiClient.get_timestamps() hard-returns (-1, -1)
    for time_mode="none" without ever asking the JVM, so
    getCurrentWatermarkInMs() would always be -1 and is_late always
    False. "processingTime" keeps late-record filtering off (it is
    event-time-mode-only) while get_timestamps() fetches the real
    event-time watermark driven by the upstream withWatermark — the
    semantics of the proven applyInPandasWithState twin
    (timers.py:tag_late_rows, NoTimeout). This processor registers no
    timers, so the processing-time timer machinery stays idle.
    Pending a protobuf-enabled environment for execution proof
    (test_tws gates on it); verified against the installed pyspark
    source (stateful_processor_api_client.get_timestamps)."""
    wm = readings.withColumn(
        "event_time", F.timestamp_millis(F.col("timestamp"))
    ).withWatermark("event_time", watermark_delay)
    return wm.groupBy("id").transformWithStateInPandas(
        statefulProcessor=LateRowTagger(),
        outputStructType=TAGGED_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


# --------------------------------------------------------------------
# W4 variant — per-window named timers (one timer stream per window)
# --------------------------------------------------------------------

class PerWindowEarlyFiringCounter(StatefulProcessor):
    """W4 with per-WINDOW timers instead of per-key multiplexed ticks —
    the closest structural match to the reference's trigger, where each
    window owns its `OneSecondIntervalTrigger` instance and timer chain
    (chapter6/CustomWindow.scala:87-148: onElement registers
    `watermark + (1000 - watermark % 1000)` per window :90-111, each
    fire re-arms `ts + 1000` :126-128, and the end-of-window timer
    FIRE_AND_PURGEs :113-125).

    Timer attribution is arithmetic, not stored: a tick timestamp t
    strictly inside a window identifies that window
    (start = t - t % window_ms, valid because tumbling windows are
    disjoint and ticks are never registered on window boundaries); a
    timestamp on a boundary (t % window_ms == 0) is the end timer of
    window t - window_ms. So each expiry touches exactly ONE window —
    O(1) per fire where the multiplexed variant scans every open
    window of the key — and no timer->window MapState is needed.

    Emission cadence delta vs the reference (shared with the
    multiplexed variant): timers that become due between micro-batches
    all fire when the next batch evaluates them, and a re-arm issued
    while handling an expiry is evaluated from the following batch."""

    def __init__(self, window_ms: int = 30_000, interval_ms: int = 1_000):
        assert window_ms % interval_ms == 0
        self.window_ms = window_ms
        self.interval_ms = interval_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.counts = handle.getMapState("counts", "start long", "cnt long")

    def _first_tick(self, start: int, wm: int) -> int | None:
        base = max(start, wm)
        tick = base - base % self.interval_ms + self.interval_ms
        return tick if tick < start + self.window_ms else None

    def handleInputRows(self, key: Tuple[str], rows: Iterator[pd.DataFrame],
                        timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        wm = timerValues.getCurrentWatermarkInMs()
        for pdf in rows:
            starts = pdf["timestamp"] - (pdf["timestamp"] % self.window_ms)
            for start, n in starts.value_counts().items():
                start = int(start)
                prev = (self.counts.getValue((start,))[0]
                        if self.counts.containsKey((start,)) else 0)
                if prev == 0:
                    self.handle.registerTimer(start + self.window_ms)
                    tick = self._first_tick(start, wm)
                    if tick is not None:
                        self.handle.registerTimer(tick)
                self.counts.updateValue((start,), (prev + int(n),))
        return iter(())

    def handleExpiredTimer(self, key: Tuple[str], timerValues: TimerValues,
                           expiredTimerInfo: ExpiredTimerInfo
                           ) -> Iterator[pd.DataFrame]:
        t = expiredTimerInfo.getExpiryTimeInMs()
        (sensor_id,) = key
        if t % self.window_ms == 0:                    # end-of-window timer
            start = t - self.window_ms
            if self.counts.containsKey((start,)):
                cnt = int(self.counts.getValue((start,))[0])
                self.counts.removeKey((start,))        # FIRE_AND_PURGE
                yield pd.DataFrame(
                    [(sensor_id, start, t, t, cnt, True)],
                    columns=["id", "window_start", "window_end",
                             "fire_ms", "cnt", "is_final"])
            return
        start = t - t % self.window_ms                 # interval tick
        if not self.counts.containsKey((start,)):
            return                                     # window already purged
        nxt = t + self.interval_ms
        if nxt < start + self.window_ms:
            self.handle.registerTimer(nxt)             # re-arm :126-128
        cnt = int(self.counts.getValue((start,))[0])
        yield pd.DataFrame(
            [(sensor_id, start, start + self.window_ms, t, cnt, False)],
            columns=["id", "window_start", "window_end",
                     "fire_ms", "cnt", "is_final"])

    def close(self) -> None:
        pass


def per_window_early_firing_counts(readings: DataFrame,
                                   window_ms: int = 30_000,
                                   interval_ms: int = 1_000,
                                   watermark_delay: str = "5 seconds"
                                   ) -> DataFrame:
    """readings: (id string, timestamp long event-ms, temperature)."""
    wm = readings.withColumn(
        "event_time", F.timestamp_millis(F.col("timestamp"))
    ).withWatermark("event_time", watermark_delay)
    return wm.groupBy("id").transformWithStateInPandas(
        statefulProcessor=PerWindowEarlyFiringCounter(window_ms, interval_ms),
        outputStructType=EARLY_FIRING_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
