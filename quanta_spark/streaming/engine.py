"""Streaming runtime — run/stop/resume + observability.

Maps the reference's control surface and telemetry:

- Bootstrap/Run/graceful stop (internal/engine/bootstrap.go:11-35,
  engine.go:14-25)             -> start_pipeline / StreamingQuery.stop
- Control RPC Ping/Deploy/Pause (api/proto/v1/control.proto:6-19,
  registered Unimplemented)    -> QueryHandle.status / stop / resume
- Prometheus /metrics endpoint (internal/telemetry/metrics.go:10-15 —
  registry only, no counters)  -> MetricsListener: per-batch rows/sec,
  state rows, watermark, recorded to a JSONL metrics file

Restart/resume: a new query started with the SAME checkpoint dir
resumes from the last committed batch — the Spark analog of the
reference redelivering uncommitted records after a rebalance
(driver_sarama.go:100-112), upgraded to exactly-once by the
idempotent sink.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.listener import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Per-batch metrics -> JSONL (the target's 'lineage + metrics')."""

    def __init__(self, out_path: str | None = None) -> None:
        self.out_path = out_path
        self.progress: list[dict] = []
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
            "stateOperators": [
                {
                    "numRowsTotal": s.numRowsTotal,
                    "numRowsUpdated": s.numRowsUpdated,
                }
                for s in (p.stateOperators or [])
            ],
            "eventTime": dict(p.eventTime) if p.eventTime else {},
        }
        with self._lock:
            self.progress.append(rec)
            if self.out_path:
                with open(self.out_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


@dataclass
class QueryHandle:
    """Thin control handle (≙ the reference's Control service intent:
    Ping -> status, PausePipeline -> stop, DeployPipeline -> start).

    ``children`` carries companion queries started alongside the main
    one (e.g. a DLQ tee when a terminal operator consumes the main
    flow); control operations fan out to them — the analog of the
    reference's one-runner-many-sinks ownership (runner.go:192-198)."""

    query: StreamingQuery
    checkpoint_dir: str
    children: list["QueryHandle"] = field(default_factory=list)

    def status(self) -> dict:
        return {
            "isActive": self.query.isActive,
            "status": self.query.status,
            "lastProgress": self.query.lastProgress,
        }

    def process_all_available(self) -> None:
        self.query.processAllAvailable()
        for c in self.children:
            c.process_all_available()

    def stop(self) -> None:
        self.query.stop()
        self.query.awaitTermination(60)
        for c in self.children:
            c.stop()


def start_pipeline(
    df: DataFrame,
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    query_name: str = "quanta_pipeline",
    trigger_available_now: bool = False,
    processing_time: str | None = None,
) -> QueryHandle:
    """Assemble and start: transformed stream -> foreachBatch sink.

    The trigger interval is the commit cadence — the Spark analog of
    the reference's commit_interval throttle (checkpoint.go:126-134,
    default 5s config.go:80-82): offsets commit once per batch, after
    the sink write completes (ack-gated commit, for free).
    """
    os.makedirs(checkpoint_dir, exist_ok=True)
    writer = (
        df.writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return QueryHandle(query=writer.start(), checkpoint_dir=checkpoint_dir)


def run_to_completion(handle: QueryHandle) -> None:
    """Drain all available input then stop (test/bench helper)."""
    handle.query.processAllAvailable()
    handle.query.stop()
    handle.query.awaitTermination(120)
    for c in handle.children:
        run_to_completion(c)


def attach_metrics(spark: SparkSession, out_path: str | None = None) -> MetricsListener:
    listener = MetricsListener(out_path)
    spark.streams.addListener(listener)
    return listener
