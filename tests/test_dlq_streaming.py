"""Dead-letter routing end to end in a STREAMING pipeline: a stage that
fails on a subset of rows must route those rows (payload intact) to the
DLQ in the same commit while the rest flow to the data sink — the
engine's explicit upgrade of the reference's silent drop+ack
(runner.go:147-156, README.md:75)."""

from __future__ import annotations

import os

import pandas as pd

from quanta_spark.datagen import generate
from quanta_spark.operators.stages import RetryPolicy, Stage, apply_chain, register
from quanta_spark.sinks.idempotent import IdempotentSink
from quanta_spark.sources.readers import stream_transcripts_files
from quanta_spark.streaming.engine import run_to_completion, start_pipeline


def test_partial_failure_splits_ok_and_dlq(spark, transcripts_dir, small_spec, tmp_workdir):
    def picky(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic partial failure: batches containing any turn of
        # the poison conversation blow up (like a plugin crashing on a
        # malformed payload)
        if (pdf["conv_id"] == "conv-00000007").any():
            raise ValueError("poison conversation")
        return pdf

    register(Stage(name="picky", batch_fn=picky, retry=RetryPolicy(attempts=1, backoff_ms=1)))
    sink = IdempotentSink(base_dir=os.path.join(tmp_workdir, "sink"))
    src = stream_transcripts_files(spark, transcripts_dir, max_files_per_trigger=2)
    h = start_pipeline(
        apply_chain(src, ["picky"]), sink, os.path.join(tmp_workdir, "ckpt")
    )
    run_to_completion(h)

    data = sink.read_data(spark).toPandas()
    dlq = sink.read_dlq(spark).toPandas()
    total = len(generate(small_spec))

    assert len(data) + len(dlq) == total, "rows lost between data and DLQ"
    assert len(dlq) > 0, "expected some dead-lettered batches"
    assert (dlq["_error"].str.contains("poison")).all()
    # the poison conv itself is fully in the DLQ
    assert "conv-00000007" not in set(data["conv_id"])
    assert (dlq["conv_id"] == "conv-00000007").any()
    # no duplicates anywhere
    both = pd.concat([data[["conv_id", "turn_idx"]], dlq[["conv_id", "turn_idx"]]])
    assert not both.duplicated().any()
