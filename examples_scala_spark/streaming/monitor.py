"""Streaming observability: a StreamingQueryListener that captures the
per-micro-batch progress metrics an operator needs to SEE scale
problems before they page — input rate vs processing rate (falling
behind?), state-store rows and memory (eviction working? watermark
stalled?), and watermark-dropped rows (late-data policy actually
firing?).

The reference exposes the same signals through Flink's metrics
registry + web UI; in Spark they arrive as JSON progress events on
every micro-batch. `MetricsCollector` keeps them queryable in-process
(tests, notebooks); production would forward the same dicts to a
metrics sink. This is the control-plane path — a few KB per
micro-batch regardless of data scale."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class MetricsCollector(StreamingQueryListener):
    """Collects per-batch progress rows: (query name, batch id, input
    rows, processing rate, state rows, watermark-dropped rows). Attach
    with `spark.streams.addListener(c)`; detach with `removeListener`."""

    def __init__(self) -> None:
        self.progress: list[dict] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state = p.stateOperators or []
        self.progress.append({
            "name": p.name,
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "state_rows": sum(s.numRowsTotal for s in state),
            "dropped_by_watermark": sum(
                s.numRowsDroppedByWatermark for s in state),
        })

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def totals(self, name: str) -> dict:
        """Aggregate view for one query: total input rows, batches,
        peak state rows, total watermark drops."""
        rows = [p for p in self.progress if p["name"] == name]
        return {
            "batches": len(rows),
            "input_rows": sum(p["num_input_rows"] for p in rows),
            "peak_state_rows": max((p["state_rows"] for p in rows),
                                   default=0),
            "dropped_by_watermark": sum(p["dropped_by_watermark"]
                                        for p in rows),
        }
