#!/usr/bin/env python3
"""spark-submit entry point — the literal deployment shape of the
north rule: ``spark-submit --master <cluster> --py-files
quanta_spark_pkg.zip scripts/submit_job.py <workdir>``.

The script imports ``quanta_spark`` ONLY from the ``--py-files`` zip
(no repo-path injection), generates a deterministic transcript input,
runs the composite streaming pipeline (stream-stream user/reply join
-> session windows) through an exactly-once idempotent sink, and
prints one JSON marker line the caller can assert on. On a real
cluster the identical invocation runs with ``--master yarn``/``k8s``
and a durable checkpoint dir — nothing in the job changes.

Tested end to end by tests/test_spark_submit.py against the real
spark-submit binary at local[4].
"""

from __future__ import annotations

import json
import os
import sys

# NOTE: quanta_spark must come from --py-files; this script never
# touches sys.path.
from quanta_spark.datagen import GenSpec, write_transcripts
from quanta_spark.operators.stateful import reply_session_stats
from quanta_spark.session import get_spark
from quanta_spark.sinks.idempotent import IdempotentSink
from quanta_spark.sources.readers import stream_transcripts_files
from quanta_spark.streaming.engine import run_to_completion, start_pipeline


def main() -> None:
    work = sys.argv[1]
    data = os.path.join(work, "in")
    write_transcripts(data, GenSpec(n_convs=40, mean_turns=6, seed=11), n_files=4)
    spark = get_spark(app_name="quanta_submit_job")
    n_in = spark.read.parquet(data).count()
    sink = IdempotentSink(base_dir=os.path.join(work, "sink"))
    src = stream_transcripts_files(spark, data, max_files_per_trigger=2)
    pipe = reply_session_stats(src, watermark="1 hour", gap="30 minutes")
    h = start_pipeline(pipe, sink, os.path.join(work, "ckpt"))
    run_to_completion(h)
    out = sink.read_data(spark)
    print(
        "SUBMIT_RESULT "
        + json.dumps(
            {
                "master": spark.sparkContext.master,
                "input_turns": n_in,
                "session_rows": out.count(),
                "distinct_convs": out.select("conv_id").distinct().count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
