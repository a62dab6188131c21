"""Streaming near-dup gate: stream==batch parity and duplicate-arrival
suppression — the contracts that make the gate usable as an ingestion
filter."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from quanta_spark.operators.dedup import neardup_index, stream_neardup_gate
from quanta_spark.streaming.engine import run_to_completion, start_pipeline


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _stream_rows(spark, pdf, op, files=3):
    import numpy as np

    d = tempfile.mkdtemp(prefix="qs_sng_")
    for k, ix in enumerate(np.array_split(np.arange(len(pdf)), files)):
        pdf.iloc[ix].to_parquet(os.path.join(d, f"p{k:04d}.parquet"), index=False)
    src = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    rows: list = []
    h = start_pipeline(op(src), lambda b, i: rows.extend(b.collect()),
                       tempfile.mkdtemp(prefix="qs_sng_ckpt_"))
    run_to_completion(h)
    shutil.rmtree(d, ignore_errors=True)
    return rows


def test_stream_matches_batch_and_duplicate_arrivals_suppressed(spark):
    docs = _docs(spark).limit(200).cache()
    idx = neardup_index(docs)
    clones = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    clones["ts"] = pd.Timestamp("2024-01-01")
    # send every clone TWICE (second arrival within the watermark)
    doubled = pd.concat([clones, clones]).sort_values("doc_id").reset_index(drop=True)

    got = _stream_rows(
        spark, doubled, lambda s: stream_neardup_gate(s, idx, watermark="2 hours")
    )
    want = stream_neardup_gate(
        spark.createDataFrame(clones), idx, watermark="2 hours"
    ).collect()
    assert len(want) > 0
    # duplicate arrivals emit no second pair; stream set == batch set
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
