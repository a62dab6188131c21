"""Sink fan-out: every output batch pushed to every configured sink,
under ONE streaming commit (reference: runner.go:192-198 pushes each
frame to all sinks; compiler.go:69-98 wires multiple sinks from the
spec). Using a single foreachBatch keeps exactly-once: either every
sink's batch-id-keyed write lands and the offset commits, or the whole
batch replays — no cross-sink divergence, unlike N independent
writeStream queries each with its own offset log."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class FanoutSink:
    """Compose N batch writers into one ack-gated commit unit."""

    def __init__(self, *sinks: Callable[[DataFrame, int], None]) -> None:
        if not sinks:
            raise ValueError("FanoutSink needs at least one sink")
        self.sinks = sinks

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            for sink in self.sinks:
                sink(batch_df, batch_id)
        finally:
            batch_df.unpersist()
