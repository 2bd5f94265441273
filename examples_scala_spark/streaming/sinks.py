"""Sinks & exactly-once machinery (SURVEY §2.10 K1-K6, §2.9 R1-R5).

The reference hand-builds three delivery guarantees (idempotent upsert,
write-ahead log, two-phase commit). In Structured Streaming the
offset/commit logs under checkpointLocation already align output with
checkpoints; what remains for custom sinks is batchId-idempotency —
implemented once here (`IdempotentBatchWriter`) and reused.
"""

from __future__ import annotations

import json
import os
import socket
import tempfile
from typing import Callable

from pyspark.sql import DataFrame


def console_sink(df: DataFrame, **options):
    """K1 — print() sink (every reference example)."""
    return df.writeStream.format("console").options(**options)


def memory_sink(df: DataFrame, name: str, output_mode: str = "update"):
    """R3/K6 — queryable state: asQueryableState('maxTemperature')
    (chapter7/QueryableState.scala:47-49) becomes a named in-memory
    table queryable with spark.sql(f"SELECT * FROM {name}") — the
    dashboard's poll loop (QueryableState.scala:84-104) is a plain SQL
    query. Production twin: sink to Delta/parquet and query that."""
    return (
        df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    )


class IdempotentBatchWriter:
    """K3/K4/K5 — batchId-idempotent foreachBatch writer.

    The reference's three exactly-once strategies collapse to one
    invariant here: a (batchId -> committed) log; re-delivered batches
    after recovery are skipped. This reproduces:
    - DerbyUpsertSink (K3, IdempotentSinkFunctionExample.scala:72-109):
      idempotency via key upsert — ours is via batch id;
    - StdOutWriteAheadSink's FileCheckpointCommitter (K4,
      WriteAheadSinkExample.scala:151-193): the committed-id file;
    - TransactionalFileSink (K5, TransactionalSinkExample.scala:137-197):
      tmp-write + atomic rename.
    """

    def __init__(self, target_dir: str,
                 write_fn: Callable[[DataFrame, int], None] | None = None):
        self.target_dir = target_dir
        self.commit_log = os.path.join(target_dir, "_committed.json")
        self.write_fn = write_fn
        os.makedirs(target_dir, exist_ok=True)

    def _committed(self) -> set[int]:
        if not os.path.exists(self.commit_log):
            return set()
        with open(self.commit_log) as f:
            return set(json.load(f))

    def _mark(self, batch_id: int) -> None:
        done = self._committed() | {batch_id}
        fd, tmp = tempfile.mkstemp(dir=self.target_dir)
        with os.fdopen(fd, "w") as f:
            json.dump(sorted(done), f)
        os.replace(tmp, self.commit_log)  # atomic, like K5's rename

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed():
            return  # replayed after recovery — already delivered
        if self.write_fn is not None:
            self.write_fn(batch_df, batch_id)
        else:
            # tmp-write + atomic rename per batch (K5's 2PC commit step;
            # parquet part files land under a batch dir)
            out = os.path.join(self.target_dir, f"batch-{batch_id}")
            batch_df.write.mode("overwrite").parquet(out)
        self._mark(batch_id)


class SocketWriter:
    """K2 — SimpleSocketSink (chapter8/SinkFunctionExample.scala:49-74):
    a ForeachWriter writing one line per row to a TCP socket.
    At-least-once, parallelism per partition."""

    def __init__(self, host: str, port: int):
        self.host, self.port = host, port

    def open(self, partition_id: int, epoch_id: int) -> bool:
        self._sock = socket.create_connection((self.host, self.port))
        return True

    def process(self, row) -> None:
        self._sock.sendall((str(tuple(row)) + "\n").encode())

    def close(self, error) -> None:
        try:
            self._sock.close()
        except Exception:
            pass


def upsert_writer(store: dict, key_col: str, val_col: str):
    """K3 — in-memory twin of the Derby UPDATE-then-INSERT upsert
    (IdempotentSinkFunctionExample.scala:89-102): last write per key
    wins, so at-least-once redelivery converges to exactly-once state."""
    def write(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.select(key_col, val_col).collect():
            store[row[key_col]] = row[val_col]
    return write
