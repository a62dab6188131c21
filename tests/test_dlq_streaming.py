"""Dead-letter routing end to end in a STREAMING pipeline: a stage that
fails on a subset of rows must route EXACTLY those rows (payload
intact) to the DLQ in the same commit while every innocent row in the
same Arrow batch flows to the data sink — the engine's explicit
upgrade of the reference's silent drop+ack (runner.go:147-156,
README.md:75), at the reference's single-frame granularity via
bisection."""

from __future__ import annotations

import os

import pandas as pd

from quanta_spark.datagen import generate
from quanta_spark.operators.stages import RetryPolicy, Stage, apply_chain, register
from quanta_spark.sinks.idempotent import IdempotentSink
from quanta_spark.sources.readers import stream_transcripts_files
from quanta_spark.streaming.engine import run_to_completion, start_pipeline

POISON = "conv-00000007"


def test_partial_failure_dead_letters_only_poison_rows(
    spark, transcripts_dir, small_spec, tmp_workdir
):
    def picky(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic partial failure: any batch slice containing a
        # poison-conversation turn blows up (like a plugin crashing on
        # a malformed payload) — bisection must isolate those rows.
        if (pdf["conv_id"] == POISON).any():
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
    gen = generate(small_spec)
    total = len(gen)

    assert len(data) + len(dlq) == total, "rows lost between data and DLQ"
    # single-frame granularity: the DLQ holds the poison conversation's
    # rows and NOTHING else; innocents in the same Arrow batch commit.
    assert set(dlq["conv_id"]) == {POISON}
    assert POISON not in set(data["conv_id"])
    assert (dlq["_error"].str.contains("poison")).all()
    assert len(dlq) == int((gen["conv_id"] == POISON).sum())
    # no duplicates anywhere
    both = pd.concat([data[["conv_id", "turn_idx"]], dlq[["conv_id", "turn_idx"]]])
    assert not both.duplicated().any()
