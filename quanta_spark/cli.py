"""Thin control-plane CLI — the working realization of the reference's
Control gRPC service, which is defined but registered Unimplemented
(api/proto/v1/control.proto:6-19, internal/transport/server.go:41-43):

- ``run``    ≙ DeployPipeline: compile a YAML pipeline spec and run it
- ``validate`` ≙ the compiler's schema/config checks without starting
- ``ping``   ≙ Control.Ping: build a session, report versions
- ``replay`` : re-run the spec's dead-letter rows through its (fixed)
  stage chain and commit survivors back to the data sink — the
  recovery half of the DLQ contract, as an operator action rather
  than a Python import (sinks/replay.py holds the crash-safe
  protocol; the reference has no equivalent, it drops failed frames
  forever, runner.go:147-156)

- ``compact`` / ``snapshots`` : sink maintenance — fold small batch
  dirs into a generation behind the atomic manifest, and list the
  committed snapshot ids time travel can read as-of.

Usage:
    python -m quanta_spark.cli run pipeline.yml [--drain]
    python -m quanta_spark.cli validate pipeline.yml
    python -m quanta_spark.cli replay pipeline.yml
    python -m quanta_spark.cli compact /path/to/sink [--target-mb 128]
    python -m quanta_spark.cli snapshots /path/to/sink
    python -m quanta_spark.cli ping
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="quanta-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_run = sub.add_parser("run", help="compile + start a pipeline spec")
    p_run.add_argument("spec", help="YAML pipeline spec path")
    p_run.add_argument(
        "--drain", action="store_true",
        help="process all available input then stop (batch-drain mode)",
    )
    p_val = sub.add_parser("validate", help="compile a spec without starting it")
    p_val.add_argument("spec")
    p_rep = sub.add_parser(
        "replay", help="re-run dead-letter rows through the spec's stage chain"
    )
    p_rep.add_argument("spec")
    p_cmp = sub.add_parser("compact", help="fold sink batch dirs into a generation")
    p_cmp.add_argument("sink_dir", help="IdempotentSink base dir")
    p_cmp.add_argument("--target-mb", type=int, default=128, help="target file size")
    p_snap = sub.add_parser("snapshots", help="list committed snapshot (batch) ids")
    p_snap.add_argument("sink_dir")
    sub.add_parser("ping", help="session liveness + versions")
    args = ap.parse_args(argv)

    from quanta_spark.session import get_spark

    if args.cmd == "ping":
        spark = get_spark(app_name="quanta_cli")
        print(json.dumps({"status": "ok", "spark": spark.version}))
        return 0

    if args.cmd in ("compact", "snapshots"):
        from quanta_spark.sinks.idempotent import IdempotentSink

        sink = IdempotentSink(base_dir=args.sink_dir)
        if args.cmd == "snapshots":
            print(json.dumps({"status": "ok", "snapshots": sink.snapshots()}))
            return 0
        spark = get_spark(app_name="quanta_cli")
        manifest = sink.compact(spark, target_file_bytes=args.target_mb << 20)
        print(json.dumps({"status": "ok", "manifest": manifest}))
        return 0

    from quanta_spark.plans.pipeline import compile_pipeline

    spark = get_spark(app_name="quanta_cli")
    with open(args.spec) as f:
        spec_text = f.read()
    compiled = compile_pipeline(spark, spec_text)
    if args.cmd == "validate":
        print(json.dumps({
            "status": "ok",
            "pipeline": compiled.name,
            "streaming": compiled.df.isStreaming,
            "columns": compiled.df.columns,
        }))
        return 0
    if args.cmd == "replay":
        from quanta_spark.sinks.replay import replay_dlq

        targets = [
            (label, s)
            for label, s in (("data", compiled.sink), ("dlq_stream", compiled.dlq_sink))
            if s is not None
        ]
        if not targets:
            print(json.dumps({"status": "error", "error": "spec has no idempotent-parquet sink"}))
            return 1
        report = {
            label: replay_dlq(spark, s, compiled.stages or [])
            for label, s in targets
        }
        print(json.dumps({"status": "ok", "pipeline": compiled.name, "replay": report}))
        return 0

    handle = compiled.start()
    if args.drain:
        from quanta_spark.streaming.engine import run_to_completion

        run_to_completion(handle)
        print(json.dumps({"status": "drained", "pipeline": compiled.name}))
    else:
        handle.query.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
