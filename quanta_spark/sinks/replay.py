"""Dead-letter replay: re-process DLQ rows through a (presumably
fixed) stage chain and commit the survivors back to the data sink.

The reference drops failed frames forever (drop+ack on retry
exhaustion, runner.go:147-156); this engine dead-letters them instead,
and replay is the recovery half of that contract.

Replay protocol (crash-safe, idempotent):

1. The replay batch id is DETERMINISTIC for a given DLQ state:
   ``-(max(abs(dlq batch ids)) + 1)`` — negative, so it can never
   collide with the streaming query's ids, and re-running a crashed
   replay recomputes the SAME id and overwrites the same batch-id
   dirs (the sink's idempotent-write property does the rest).
2. The sink write commits recovered rows under data/batch_id=<rid>
   and still-failing rows under dlq/batch_id=<rid>.
3. Only after that write do the consumed DLQ batch dirs get deleted
   (idempotent re-delete) — a crash between 2 and 3 re-runs into the
   same rid, not into duplicates.

Accounting invariant preserved: every input row is in exactly one of
data/ or dlq/ after any number of replays or crashes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from quanta_spark.operators import stages as stage_mod
from quanta_spark.sinks.idempotent import IdempotentSink


def _dlq_batch_ids(sink: IdempotentSink) -> list[int]:
    if not os.path.isdir(sink.dlq_dir):
        return []
    out = []
    for name in os.listdir(sink.dlq_dir):
        if name.startswith("batch_id="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def replay_dlq(
    spark: SparkSession,
    sink: IdempotentSink,
    stages: list,
) -> dict:
    """Re-run the sink's dead-letter rows through ``stages`` and commit
    survivors to data. Returns {"replay_batch_id", "attempted",
    "recovered", "still_failed"}."""
    batch_ids = _dlq_batch_ids(sink)
    if not batch_ids:
        return {"replay_batch_id": None, "attempted": 0, "recovered": 0, "still_failed": 0}
    dlq = sink.read_dlq(spark)
    attempted = dlq.count()
    if attempted == 0:
        # only empty dirs: clean them up and report a no-op
        for b in batch_ids:
            shutil.rmtree(os.path.join(sink.dlq_dir, f"batch_id={b}"), ignore_errors=True)
        return {"replay_batch_id": None, "attempted": 0, "recovered": 0, "still_failed": 0}

    rid = -(max(abs(b) for b in batch_ids) + 1)
    src = (
        dlq.drop("_batch_id", "batch_id")
        .withColumn(stage_mod.STATUS_COL, F.lit(stage_mod.STATUS_OK))
        .withColumn(stage_mod.ERROR_COL, F.lit(None).cast("string"))
    )
    out = stage_mod.apply_chain(src, stages)
    sink(out, rid)  # idempotent: same rid on crash-rerun overwrites
    for b in batch_ids:
        shutil.rmtree(os.path.join(sink.dlq_dir, f"batch_id={b}"), ignore_errors=True)
    recovered = (
        sink.read_data(spark).filter(F.col("batch_id") == rid).count()
    )
    still = sink.read_dlq(spark).count()
    return {
        "replay_batch_id": rid,
        "attempted": attempted,
        "recovered": recovered,
        "still_failed": still,
    }
