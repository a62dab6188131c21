#!/usr/bin/env python3
"""Streaming scale-step benchmark: the two heaviest STATEFUL operators
(turn-order CEP and the north-star join->session composite) at 1x and
10x turns on the same core count — where 10^12-turn scale actually
bites. Complements bench_scale_step.py (batch ops) and
bench_scaling.py (fixed input, varying cores).

For each leg the MetricsListener records per-batch addBatch duration
and state-store rows/bytes, so the output shows not just the wall-time
ratio but whether STATE grows proportionally to input (it must: state
is keyed per conversation) and whether per-batch commit cost stays
bounded.

Interpretation: with the same core count, a healthy ratio is ~10x wall
(linear work, fixed parallelism) with state bytes ~10x and per-batch
commit time growing far slower than 10x (RocksDB changelog
checkpointing uploads deltas, not snapshots).

Usage: python bench_scale_step_stream.py   (IDLE box! ~10 min)
Writes BENCH/scale_step_stream.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402

from quanta_spark.datagen import GenSpec, generate, write_heartbeat_file, write_transcripts  # noqa: E402
from quanta_spark.operators.stateful import enforce_turn_order, reply_session_stats  # noqa: E402
from quanta_spark.session import get_spark  # noqa: E402
from quanta_spark.sources.readers import stream_transcripts_files  # noqa: E402
from quanta_spark.streaming.engine import attach_metrics, run_to_completion, start_pipeline  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE_TURNS = int(os.environ.get("QS_STREAM_STEP_TURNS", "600000"))
SCALES = {"1x": BASE_TURNS, "10x": BASE_TURNS * 10}


def _input_dir(target_turns: int, n_files: int = 128) -> tuple[str, int]:
    n_convs = max(200, target_turns // 16)
    spec = GenSpec(
        n_convs=n_convs, mean_turns=16, seed=42, mega_frac=0.02, late_frac=0.005
    )
    cache = f"/tmp/qs_stream_step_v2_{n_convs}"
    marker = os.path.join(cache, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(cache, ignore_errors=True)
        write_transcripts(cache, spec, n_files=n_files)
        pdf = generate(spec)
        write_heartbeat_file(cache, pdf["ts"].max() + pd.Timedelta(days=30))
        with open(marker, "w") as f:
            f.write(str(len(pdf)))
    with open(marker) as f:
        return cache, int(f.read())


def _run(spark, listener, data_dir: str, op, ckpt: str) -> dict:
    start_idx = len(listener.progress)
    src = stream_transcripts_files(
        spark, data_dir, max_files_per_trigger=64, with_lineage=False
    )
    counts: list[int] = []
    t0 = time.perf_counter()
    h = start_pipeline(op(src), lambda b, i: counts.append(b.count()), ckpt)
    run_to_completion(h)
    wall = time.perf_counter() - t0
    with listener._lock:
        recs = listener.progress[start_idx:]
    add_batch = [r["durationMs"].get("addBatch") for r in recs if r["durationMs"].get("addBatch")]
    state_rows = [
        sum(s.get("numRowsTotal") or 0 for s in r.get("stateOperators", []))
        for r in recs
    ]
    state_bytes = [
        sum(s.get("memoryUsedBytes") or 0 for s in r.get("stateOperators", []))
        for r in recs
    ]
    return {
        "wall_sec": round(wall, 3),
        "batches": len(recs),
        "add_batch_ms_mean": round(sum(add_batch) / max(len(add_batch), 1), 1),
        "add_batch_ms_max": max(add_batch, default=0),
        "state_rows_max": max(state_rows, default=0),
        "state_bytes_max": max(state_bytes, default=0),
        "output_rows": int(sum(counts)),
    }


def _doc_stream_dir(n_docs: int, n_files: int = 32) -> str:
    """New-day document stream: the whole corpus re-arrives as clones
    (new ids) to be gated against the maintained index — the heaviest
    realistic ingest (every row hits the index buckets)."""
    import numpy as np

    from quanta_spark.datagen import generate_documents

    cache = f"/tmp/qs_docstream_step_v2_{n_docs}"
    marker = os.path.join(cache, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache)
        pdf = generate_documents(n_docs, seed=42)[["doc_id", "text"]].copy()
        pdf["doc_id"] = pdf["doc_id"] + 10_000_000
        pdf["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            np.arange(len(pdf)), unit="s"
        )
        import pyarrow as pa
        import pyarrow.parquet as pq

        # explicit us timestamps: pandas' default ns unit writes an
        # INT64 column Spark's vectorized reader rejects
        schema = pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("text", pa.string()),
                pa.field("ts", pa.timestamp("us")),
            ]
        )
        from quanta_spark.datagen import stamp_arrival_order

        paths = []
        for k, ix in enumerate(np.array_split(np.arange(len(pdf)), n_files)):
            path = os.path.join(cache, f"part-{k:05d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(pdf.iloc[ix], schema=schema, preserve_index=False),
                path,
            )
            paths.append(path)
        stamp_arrival_order(paths)  # no ms-mtime ties in replay order
        open(marker, "w").close()
    return cache


def _run_gate(spark, listener, n_docs: int, ckpt: str) -> dict:
    from quanta_spark.datagen import generate_documents
    from quanta_spark.operators.dedup import neardup_index, stream_neardup_gate

    hist = spark.createDataFrame(generate_documents(n_docs, seed=42)[["doc_id", "text"]])
    index = neardup_index(hist).cache()
    index.count()  # index build is the maintained artifact — untimed
    data_dir = _doc_stream_dir(n_docs)
    src = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 16)
        .parquet(data_dir)
    )
    start_idx = len(listener.progress)
    counts: list[int] = []
    t0 = time.perf_counter()
    h = start_pipeline(
        stream_neardup_gate(src, index),
        lambda b, i: counts.append(b.count()),
        ckpt,
    )
    run_to_completion(h)
    wall = time.perf_counter() - t0
    index.unpersist()
    with listener._lock:
        recs = listener.progress[start_idx:]
    add_batch = [r["durationMs"].get("addBatch") for r in recs if r["durationMs"].get("addBatch")]
    state_rows = [
        sum(s.get("numRowsTotal") or 0 for s in r.get("stateOperators", []))
        for r in recs
    ]
    state_bytes = [
        sum(s.get("memoryUsedBytes") or 0 for s in r.get("stateOperators", []))
        for r in recs
    ]
    return {
        "wall_sec": round(wall, 3),
        "batches": len(recs),
        "add_batch_ms_mean": round(sum(add_batch) / max(len(add_batch), 1), 1),
        "add_batch_ms_max": max(add_batch, default=0),
        "state_rows_max": max(state_rows, default=0),
        "state_bytes_max": max(state_bytes, default=0),
        "output_rows": int(sum(counts)),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / wall, 1),
    }


def _run_gapfill(spark, listener, n_events: int, ckpt: str) -> dict:
    """Streaming time-bucket gap fill leg: n_events synthetic events
    across n_events/2000 keys, 6h grid, heartbeat-drained. The scale
    claims: wall ~ events (one stateful pass), state_rows ~ KEYS (a
    2-scalar LOCF carry + watermark-bounded pending), never ~ events."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quanta_spark.datagen import stamp_arrival_order
    from quanta_spark.operators.stateful import stream_gapfill_locf

    n_users = max(50, n_events // 2000)
    d = f"/tmp/qs_gapfill_stream_{n_events}"
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        i = np.arange(n_events, dtype=np.int64)
        pdf = pd.DataFrame(
            {
                "user_id": i % n_users,
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(i, unit="s"),
                "value": ((i * 37) % 1000) / 10.0,
            }
        )
        schema = pa.schema(
            [
                pa.field("user_id", pa.int64()),
                pa.field("ts", pa.timestamp("us")),
                pa.field("value", pa.float64()),
            ]
        )
        paths = []
        for k, ix in enumerate(np.array_split(i, 8)):
            p = os.path.join(d, f"part-{k:05d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(pdf.iloc[ix], schema=schema, preserve_index=False), p
            )
            paths.append(p)
        hb = pdf.iloc[[0]].copy()
        hb["user_id"] = -1
        hb["ts"] = pdf["ts"].max() + pd.Timedelta(days=30)
        php = os.path.join(d, "part-heartbeat.parquet")
        pq.write_table(pa.Table.from_pandas(hb, schema=schema, preserve_index=False), php)
        stamp_arrival_order(paths + [php])
        open(os.path.join(d, "_DONE"), "w").close()
    src = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 2)
        .parquet(d)
    )
    start_idx = len(listener.progress)
    counts: list[int] = []
    t0 = time.perf_counter()
    h = start_pipeline(
        stream_gapfill_locf(src, bucket="6 hours", watermark="1 hour"),
        lambda b, i: counts.append(b.count()),
        ckpt,
    )
    run_to_completion(h)
    wall = time.perf_counter() - t0
    with listener._lock:
        recs = listener.progress[start_idx:]
    add_batch = [r["durationMs"].get("addBatch") for r in recs if r["durationMs"].get("addBatch")]
    state_rows = [
        sum(s.get("numRowsTotal") or 0 for s in r.get("stateOperators", []))
        for r in recs
    ]
    state_bytes = [
        sum(s.get("memoryUsedBytes") or 0 for s in r.get("stateOperators", []))
        for r in recs
    ]
    return {
        "wall_sec": round(wall, 3),
        "batches": len(recs),
        "add_batch_ms_mean": round(sum(add_batch) / max(len(add_batch), 1), 1),
        "add_batch_ms_max": max(add_batch, default=0),
        "state_rows_max": max(state_rows, default=0),
        "state_bytes_max": max(state_bytes, default=0),
        "output_rows": int(sum(counts)),
        "events": n_events,
        "keys": n_users,
        "events_per_sec": round(n_events / wall, 1),
    }


def _run_conv_gate(spark, listener, data_dir: str, n_turns: int, ckpt: str) -> dict:
    """Conversation dedup gate: the SAME transcript stream arrives and
    every closed >=3-turn session probes a historical session index
    built from the identical corpus (worst case: every session hits).
    Index build is the maintained artifact — untimed."""
    from quanta_spark.datagen import HEARTBEAT_CONV
    from quanta_spark.operators.dedup import (
        session_fingerprint_index,
        stream_conv_dedup_gate,
    )

    batch = spark.read.parquet(os.path.join(data_dir, "*.parquet")).filter(
        f"conv_id != '{HEARTBEAT_CONV}'"
    )
    index = session_fingerprint_index(batch, gap="30 minutes").cache()
    index.count()
    start_idx = len(listener.progress)
    src = stream_transcripts_files(
        spark, data_dir, max_files_per_trigger=64, with_lineage=False
    )
    counts: list[int] = []
    t0 = time.perf_counter()
    h = start_pipeline(
        stream_conv_dedup_gate(src, index, gap="30 minutes"),
        lambda b, i: counts.append(b.count()),
        ckpt,
    )
    run_to_completion(h)
    wall = time.perf_counter() - t0
    index.unpersist()
    with listener._lock:
        recs = listener.progress[start_idx:]
    add_batch = [r["durationMs"].get("addBatch") for r in recs if r["durationMs"].get("addBatch")]
    state_rows = [
        sum(s.get("numRowsTotal") or 0 for s in r.get("stateOperators", []))
        for r in recs
    ]
    state_bytes = [
        sum(s.get("memoryUsedBytes") or 0 for s in r.get("stateOperators", []))
        for r in recs
    ]
    return {
        "wall_sec": round(wall, 3),
        "batches": len(recs),
        "add_batch_ms_mean": round(sum(add_batch) / max(len(add_batch), 1), 1),
        "add_batch_ms_max": max(add_batch, default=0),
        "state_rows_max": max(state_rows, default=0),
        "state_bytes_max": max(state_bytes, default=0),
        "output_rows": int(sum(counts)),
        "turns": n_turns,
        "turns_per_sec": round(n_turns / wall, 1),
    }


def main() -> None:
    spark = get_spark(
        app_name="quanta_stream_step", cores=CPUS, shuffle_partitions=CPUS
    )
    listener = attach_metrics(spark)
    only = {
        n.strip() for n in os.environ.get("STREAM_STEP_ONLY", "").split(",") if n.strip()
    }

    def want(name: str) -> bool:
        return not only or name in only

    from pyspark.sql import functions as F

    from quanta_spark.operators.stateful import stream_cusum, stream_ks_monitor, stream_temporal_join, stream_topk_terms
    from quanta_spark.operators.timeseries import m4_downsample

    ops = {
        "stream_turn_order": lambda src: enforce_turn_order(src, watermark="1 hour"),
        "stream_composite": lambda src: reply_session_stats(src, watermark="1 hour"),
        "stream_topk_terms": lambda src: stream_topk_terms(
            src, k=10, window="1 day", watermark="1 hour"
        ),
        "stream_cusum": lambda src: stream_cusum(
            src.select(
                "conv_id",
                "ts",
                (
                    F.length("text").cast("long")
                    + 40 * F.floor(F.col("turn_idx") / 20).cast("long")
                ).cast("double").alias("value"),
            ),
            key_col="conv_id",
            ts_col="ts",
            value_col="value",
            target=16.0,
            slack=8.0,
            threshold=200.0,
        ),
        "stream_temporal_join": lambda src: stream_temporal_join(
            src.select(
                "conv_id",
                "ts",
                (F.col("role") == "user").alias("is_dim"),
                F.when(
                    F.col("role") == "user", F.split(F.col("text"), " ").getItem(0)
                ).alias("attr"),
                F.col("turn_idx").cast("long").alias("seq"),
            ),
            watermark="1 hour",
        ),
        "stream_ks_monitor": lambda src: stream_ks_monitor(
            src.select("ts", F.length("text").cast("double").alias("value")),
            [1] * 32,  # flat reference: per-window KS vs uniform
            0,
            32,
            32,
            window="6 hours",
            watermark="1 hour",
        ),
        "stream_m4": lambda src: m4_downsample(
            src.select("role", "ts", F.length("text").cast("double").alias("value")),
            key_col="role",
            ts_col="ts",
            value_col="value",
            bucket="6 hours",
            watermark="1 hour",
        ),
    }
    ops = {n: f for n, f in ops.items() if want(n)}
    work = f"/tmp/qs_stream_step_work_{os.getpid()}"
    os.makedirs(work, exist_ok=True)
    results: dict[str, dict] = {name: {} for name in ops}
    turns: dict[str, int] = {}
    for tag, target in SCALES.items():
        data_dir, n_turns = _input_dir(target)
        turns[tag] = n_turns
        # warm file listing + JVM before the first timed leg of the scale
        spark.read.parquet(os.path.join(data_dir, "part-00000.parquet")).count()
        for name, op in ops.items():
            r = _run(spark, listener, data_dir, op, os.path.join(work, f"{name}_{tag}"))
            r["turns"] = n_turns
            r["turns_per_sec"] = round(n_turns / r["wall_sec"], 1)
            results[name][tag] = r
    if want("stream_neardup_gate"):
        gate_scales = {"1x": 5_000, "10x": 50_000}
        results["stream_neardup_gate"] = {}
        for tag, nd in gate_scales.items():
            results["stream_neardup_gate"][tag] = _run_gate(
                spark, listener, nd, os.path.join(work, f"gate_{tag}")
            )
    if want("stream_conv_gate"):
        results["stream_conv_gate"] = {}
        for tag, target in SCALES.items():
            data_dir, n_turns = _input_dir(target)
            results["stream_conv_gate"][tag] = _run_conv_gate(
                spark, listener, data_dir, n_turns, os.path.join(work, f"convgate_{tag}")
            )
    if want("stream_gapfill"):
        results["stream_gapfill"] = {}
        for tag, ne in {"1x": 100_000, "10x": 1_000_000}.items():
            results["stream_gapfill"][tag] = _run_gapfill(
                spark, listener, ne, os.path.join(work, f"gapfill_{tag}")
            )
    for name, r in results.items():
        r["wall_ratio_10x"] = round(r["10x"]["wall_sec"] / r["1x"]["wall_sec"], 2)
        r["state_bytes_ratio_10x"] = round(
            r["10x"]["state_bytes_max"] / max(r["1x"]["state_bytes_max"], 1), 2
        )
        r["add_batch_ratio_10x"] = round(
            r["10x"]["add_batch_ms_mean"] / max(r["1x"]["add_batch_ms_mean"], 1e-9), 2
        )
    payload = {
        "metric": "stateful streaming wall/state/commit at 1x vs 10x turns, fixed cores",
        "cores": CPUS,
        "turns": turns,
        "ops": results,
    }
    os.makedirs("BENCH", exist_ok=True)
    if only and os.path.exists("BENCH/scale_step_stream.json"):
        # partial run: merge fresh legs into the existing artifact
        with open("BENCH/scale_step_stream.json") as f:
            old = json.load(f)
        merged = old.get("ops", {})
        merged.update(payload["ops"])
        payload["ops"] = merged
        payload["turns"] = payload["turns"] or old.get("turns", {})
    with open("BENCH/scale_step_stream.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
