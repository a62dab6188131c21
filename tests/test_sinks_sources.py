"""Sink fan-out (reference: multi-sink push, runner.go:192-198), the
rate synthetic source, and approximate-aggregate accuracy bounds."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from quanta_spark.datagen import generate
from quanta_spark.operators.stages import apply_chain
from quanta_spark.sinks.fanout import FanoutSink
from quanta_spark.sinks.idempotent import IdempotentSink
from quanta_spark.sources.readers import stream_rate_transcripts, stream_transcripts_files
from quanta_spark.streaming.engine import run_to_completion, start_pipeline


def test_fanout_sink_single_commit(spark, transcripts_dir, small_spec, tmp_workdir):
    a = IdempotentSink(base_dir=os.path.join(tmp_workdir, "a"))
    b = IdempotentSink(base_dir=os.path.join(tmp_workdir, "b"))
    counts = []
    fan = FanoutSink(a, b, lambda df, bid: counts.append(df.count()))
    src = stream_transcripts_files(spark, transcripts_dir, max_files_per_trigger=4)
    h = start_pipeline(apply_chain(src, ["uppercase"]), fan, os.path.join(tmp_workdir, "ckpt"))
    run_to_completion(h)

    total = len(generate(small_spec))
    assert a.read_data(spark).count() == total
    assert b.read_data(spark).count() == total
    assert sum(counts) == total
    # both sinks committed the same batch ids (one commit unit)
    assert sorted(a.batches_seen) == sorted(b.batches_seen)
    assert a.batches_seen
    la = a.read_lineage(spark).select("batch_id").distinct().toPandas()
    lb = b.read_lineage(spark).select("batch_id").distinct().toPandas()
    assert set(la.batch_id) == set(lb.batch_id)


def test_rate_source_produces_transcript_rows(spark, tmp_workdir):
    src = stream_rate_transcripts(spark, rows_per_second=500, n_convs=10)
    assert src.isStreaming
    assert src.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    rows = []
    h = start_pipeline(
        src,
        lambda b, i: rows.extend(b.collect()),
        os.path.join(tmp_workdir, "ckpt"),
        processing_time="0 seconds",
    )
    deadline = time.time() + 30
    while not rows and time.time() < deadline:
        time.sleep(0.2)
    h.stop()
    assert rows, "rate source produced nothing in 30s"
    r = rows[0]
    assert r["conv_id"].startswith("conv-")
    assert r["role"] in ("user", "assistant")


def test_approx_distinct_within_rsd(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    exact = li.select(F.count_distinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", 0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.06  # 3x rsd margin


def test_cli_validate_and_drain(spark, transcripts_dir, tmp_workdir, capsys):
    import json as _json

    from quanta_spark.cli import main as cli_main

    spec_path = os.path.join(tmp_workdir, "p.yml")
    with open(spec_path, "w") as f:
        f.write(f"""
schema_version: v1
pipeline:
  name: cli-e2e
  source: {{kind: parquet-stream, path: {transcripts_dir}, max_files_per_trigger: 8}}
  transformers: [{{name: uppercase}}]
  sink: {{kind: idempotent-parquet, path: {tmp_workdir}/out}}
  checkpoint: {tmp_workdir}/ckpt
  trigger: available_now
""")
    assert cli_main(["validate", spec_path]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok" and out["pipeline"] == "cli-e2e"

    assert cli_main(["run", spec_path, "--drain"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "drained"
    got = spark.read.parquet(os.path.join(tmp_workdir, "out", "data", "batch_id=*"))
    assert got.count() > 0
