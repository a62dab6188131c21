#!/usr/bin/env python3
"""Headline benchmark for the quanta_spark engine.

Measures the north-star streaming pipeline (transcript stream ->
vectorized transform -> session windows / stateful join / turn-order
enforcement -> exactly-once sink) as sustained turns/sec, plus a
representative batch-operator suite on the driver's sf tables.

Prints a verbose {"box_detail": ...} JSON line first, then the compact
metric line LAST and alone (the driver captures only the stdout tail,
so the parseable line must be final and short — VERDICT r05 #2):
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "turns_per_sec": {...}}
The full dict (compact + box) is also written to BENCH/last_run_full.json.

Env knobs:
  SPARK_GRAFT_SF_DIR   input tables dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  QS_BENCH_TURNS       approx generated stream size (default scales with sf)
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
from quanta_spark.operators.stages import apply_chain  # noqa: E402
from quanta_spark.operators.stateful import (  # noqa: E402
    enforce_turn_order,
    join_user_replies,
    reply_session_stats,
)
from quanta_spark.operators.windows import sessionize  # noqa: E402
from quanta_spark.session import get_spark  # noqa: E402
from quanta_spark.sinks.idempotent import IdempotentSink  # noqa: E402
from quanta_spark.sources.readers import stream_transcripts_files  # noqa: E402
from quanta_spark.streaming.engine import run_to_completion, start_pipeline  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_input(sf: float, n_files: int = 128) -> tuple[str, int]:
    """Deterministic transcript stream sized to the scale factor,
    pre-split into >= 4N files (BASELINE.md scaling protocol), cached
    across runs (same seed => identical bytes)."""
    target_turns = int(os.environ.get("QS_BENCH_TURNS", int(6_000_000 * sf)))
    n_convs = max(200, target_turns // 16)
    spec = GenSpec(
        n_convs=n_convs, mean_turns=16, seed=42, mega_frac=0.02, late_frac=0.005
    )
    cache = f"/tmp/qs_bench_input_v4_{sf}_{n_convs}"
    marker = os.path.join(cache, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(cache, ignore_errors=True)
        write_transcripts(cache, spec, n_files=n_files)
        pdf = generate(spec)
        write_heartbeat_file(cache, pdf["ts"].max() + pd.Timedelta(days=30))
        n_rows = len(pdf)
        with open(marker, "w") as f:
            f.write(str(n_rows))
    with open(marker) as f:
        n_rows = int(f.read())
    return cache, n_rows


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


# Steal above this during a leg means the hypervisor neighbor took a
# material bite out of it (measured: steal appears on this VM only
# under OUR load — CPU overcommit — so the launch gate alone cannot
# catch it; 2026-08-17 runs saw composite 14.4s at ~0 steal vs 39.8s
# at 2.2 stolen cores).
STEAL_RETRY_CORES = 0.3


def timed_leg(fn) -> tuple[float, float, float]:
    """Wall seconds + per-leg stolen/busy cores, so each leg in the
    artifact carries its own contamination evidence instead of one
    whole-run average."""
    ncpu = os.cpu_count() or CPUS
    j0, i0, s0 = _cpu_jiffies()
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    j1, i1, s1 = _cpu_jiffies()
    dj = max(j1 - j0, 1)
    steal = (s1 - s0) / dj * ncpu
    busy = (dj - (i1 - i0) - (s1 - s0)) / dj * ncpu
    return dt, steal, busy


# Global per-run retry budget: a steal-bursty box could otherwise
# triple every leg (+120s cooldown each) and blow the driver's wall
# budget — the round-6 first re-run did exactly that and got killed at
# 590s. At most this many extra attempts / cooldown waits per run;
# once exhausted, dirty legs keep attempt 0 and are flagged.
_RETRY_BUDGET = {"retries": 4, "cooldowns": 1}


def run_leg(fn_for_attempt, retries: dict, name: str, contaminated: set):
    """Run a leg; steal-contaminated attempts are retried, bounded.

    Policy (VERDICT r05 asks #4 + ADVICE):
    - attempt 0 clean (steal <= STEAL_RETRY_CORES) -> keep it.
    - else attempt 1; keep it ONLY if attempt 1 is itself clean (the
      r05 min-of-two rule biased walls downward when both attempts
      were dirty).
    - else a SUSTAINED burst (r05 driver: composite 2.21/2.74 stolen
      cores on both attempts): one bounded cooldown (wait for the box
      to go quiet, <=120s) then ONE final attempt; if clean, keep it.
    - still dirty -> keep the LEAST-STOLEN attempt, mark the leg
      ``contaminated`` so the headline is reported both with and
      without it. Every attempt lands in ``retried_legs`` — nothing
      is hidden.
    """
    dt, steal, busy = timed_leg(fn_for_attempt(0))
    if steal <= STEAL_RETRY_CORES:
        return dt, steal, busy
    rec = retries[name] = {
        "attempt0_sec": round(dt, 3),
        "attempt0_steal_cores": round(steal, 2),
    }
    if _RETRY_BUDGET["retries"] <= 0:
        rec["kept"] = "attempt0_retry_budget_exhausted"
        rec["contaminated"] = True
        contaminated.add(name)
        return dt, steal, busy
    _RETRY_BUDGET["retries"] -= 1
    attempts = [(dt, steal, busy)]
    dt1, steal1, busy1 = timed_leg(fn_for_attempt(1))
    rec["attempt1_sec"] = round(dt1, 3)
    rec["attempt1_steal_cores"] = round(steal1, 2)
    if steal1 <= STEAL_RETRY_CORES:
        rec["kept"] = "attempt1"
        return dt1, steal1, busy1
    attempts.append((dt1, steal1, busy1))
    if _RETRY_BUDGET["cooldowns"] > 0 and _RETRY_BUDGET["retries"] > 0:
        _RETRY_BUDGET["cooldowns"] -= 1
        _RETRY_BUDGET["retries"] -= 1
        rec["cooldown"] = _wait_for_quiet_box(max_wait_sec=120.0)
        dt2, steal2, busy2 = timed_leg(fn_for_attempt(2))
        rec["attempt2_sec"] = round(dt2, 3)
        rec["attempt2_steal_cores"] = round(steal2, 2)
        if steal2 <= STEAL_RETRY_CORES:
            rec["kept"] = "attempt2_post_cooldown"
            return dt2, steal2, busy2
        attempts.append((dt2, steal2, busy2))
    best = min(range(len(attempts)), key=lambda i: attempts[i][1])
    rec["kept"] = f"attempt{best}_least_steal"
    rec["contaminated"] = True
    contaminated.add(name)
    return attempts[best]


def _cpu_jiffies() -> tuple[int, int, int]:
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    # total, idle+iowait, steal — steal is the hypervisor-neighbor
    # signal: measured 58k jiffies (~3.5 cores continuously) during one
    # degraded run, fully explaining a 2x streaming slowdown at LOW
    # busy-cores; a run with material steal is not a code regression
    return sum(vals), vals[3] + vals[4], vals[7]


def _wait_for_quiet_box(
    max_wait_sec: float = 300.0,
    load_thresh: float = 2.0,
    steal_cores_thresh: float = 0.05,
    probe_sec: float = 2.0,
) -> dict:
    """Refuse to start timed legs on a loaded box (VERDICT r04 ask #4:
    BENCH_r04 launched at loadavg 9.6 / 12.5 busy cores and regressed
    every leg vs an idle re-run). Spin until 1-min loadavg and steal are
    under thresholds, bounded by max_wait_sec; the outcome — waited
    seconds and whether the gate was satisfied — lands in the result
    JSON either way so a dirty launch is self-documenting."""
    t0 = time.perf_counter()
    clean = False
    load1 = steal_cores = 0.0
    ncpu = os.cpu_count() or CPUS
    while True:
        load1 = os.getloadavg()[0]
        j0, _, s0 = _cpu_jiffies()
        time.sleep(probe_sec)
        j1, _, s1 = _cpu_jiffies()
        steal_cores = (s1 - s0) / max(j1 - j0, 1) * ncpu
        if load1 < load_thresh and steal_cores < steal_cores_thresh:
            clean = True
            break
        if time.perf_counter() - t0 >= max_wait_sec:
            break
        time.sleep(max(probe_sec, 5.0))
    return {
        "waited_sec": round(time.perf_counter() - t0, 1),
        "clean_launch": clean,
        "loadavg1_at_start": round(load1, 2),
        "steal_cores_at_start": round(steal_cores, 2),
    }


def run_stream(spark, data_dir: str, op, ckpt: str, files_per_trigger: int = 64) -> None:
    """files_per_trigger=64 over 128 files => 2 data batches + flush —
    the same mega-batch stance as the scaling protocol: the ~3s/batch
    state-commit + planning fixed cost is measured separately
    (BENCH/BASELINE.md) and at 8 small batches it dominates the leg and
    its run-to-run variance rather than measuring the engine."""
    src = stream_transcripts_files(
        spark, data_dir, max_files_per_trigger=files_per_trigger, with_lineage=False
    )
    sink_rows = []
    h = start_pipeline(
        op(src), lambda b, i: sink_rows.append(b.count()), ckpt
    )
    run_to_completion(h)


def run_e2e_sink(spark, data_dir: str, out_dir: str) -> None:
    src = stream_transcripts_files(spark, data_dir, max_files_per_trigger=16)
    out = apply_chain(src, ["uppercase"])
    sink = IdempotentSink(base_dir=out_dir)
    h = start_pipeline(out, sink, os.path.join(out_dir, "_ckpt"))
    run_to_completion(h)


def main() -> None:
    sf = _sf_of(SF_DIR)
    # box-load evidence (BENCH/BASELINE.md variance protocol): pre-run
    # load average + external busy cores sampled over the whole run, so
    # a noisy-neighbor leg is visible IN the result JSON, not just prose
    gate = _wait_for_quiet_box()
    load_before = os.getloadavg()
    j0, i0, s0 = _cpu_jiffies()
    spark = get_spark(
        app_name=f"quanta_bench_sf{sf}", cores=CPUS, shuffle_partitions=CPUS
    )
    data_dir, n_turns = bench_input(sf)
    work = f"/tmp/qs_bench_work_{os.getpid()}"
    os.makedirs(work, exist_ok=True)

    times: dict[str, float] = {}
    tps: dict[str, float] = {}

    # warm the JVM/Python-worker pools so the first measured query
    # doesn't pay one-time start-up costs
    spark.read.parquet(os.path.join(data_dir, "part-00000.parquet")).count()
    # ... and the STREAMING machinery (python workers, RocksDB state
    # store, stateful codegen): measured 19.4s first composite rep vs
    # 13.5/14.3 warm on an idle box — without this, one-time init lands
    # in whichever leg runs first (BENCH/BASELINE.md round-4 note)
    warm_spec = GenSpec(n_convs=60, mean_turns=8, seed=11)
    warm_dir = "/tmp/qs_bench_warmup_v2"
    if not os.path.exists(os.path.join(warm_dir, "_DONE")):
        shutil.rmtree(warm_dir, ignore_errors=True)
        write_transcripts(warm_dir, warm_spec, n_files=2)
        wpdf = generate(warm_spec)
        write_heartbeat_file(warm_dir, wpdf["ts"].max() + pd.Timedelta(days=30))
        open(os.path.join(warm_dir, "_DONE"), "w").close()
    run_stream(
        spark, warm_dir,
        lambda src: reply_session_stats(src, watermark="1 hour"),
        os.path.join(work, "warmup"),
    )

    streams = {
        "stream_session": lambda src: sessionize(src, gap="30 minutes", watermark="1 hour"),
        "stream_turn_order": lambda src: enforce_turn_order(src, watermark="1 hour"),
        "stream_reply_join": lambda src: join_user_replies(src, watermark="1 hour"),
        # north-star composite: join -> session windows, one query
        "stream_composite": lambda src: reply_session_stats(src, watermark="1 hour"),
    }
    leg_box: dict[str, dict] = {}
    retries: dict[str, dict] = {}
    contaminated: set[str] = set()

    def record(name: str, dt: float, steal: float, busy: float, stream: bool) -> None:
        times[name] = round(dt, 3)
        if stream:
            tps[name] = round(n_turns / dt, 1)
        leg_box[name] = {"steal_cores": round(steal, 2), "busy_cores": round(busy, 1)}

    for name, op in streams.items():
        dt, steal, busy = run_leg(
            lambda att, op=op, name=name: lambda: run_stream(
                spark, data_dir, op, os.path.join(work, f"{name}_a{att}")
            ),
            retries,
            name,
            contaminated,
        )
        record(name, dt, steal, busy, stream=True)

    dt, steal, busy = run_leg(
        lambda att: lambda: run_e2e_sink(
            spark, data_dir, os.path.join(work, f"e2e_a{att}")
        ),
        retries,
        "stream_e2e_sink",
        contaminated,
    )
    record("stream_e2e_sink", dt, steal, busy, stream=True)

    # representative batch operators on the driver's sf tables
    from quanta_spark import queries as q

    batch = [
        ("q01_pricing_summary", q.QUERY_FNS["q01_pricing_summary"]),
        ("q03_regional_revenue", q.QUERY_FNS["q03_regional_revenue"]),
        ("q13_session_windows", q.QUERY_FNS["q13_session_windows"]),
        ("q16_two_phase_conv_stats", q.QUERY_FNS["q16_two_phase_conv_stats"]),
        ("q21_exact_dedup", q.QUERY_FNS["q21_exact_dedup"]),
        ("q22_ngram_jaccard", q.QUERY_FNS["q22_ngram_jaccard"]),
        ("q27_cosine_topk", q.QUERY_FNS["q27_cosine_topk"]),
        # the PRODUCTION minhash path (xxhash64, dedup.py default) is
        # the headline q28 number; the md5 family exists only so the
        # DuckDB oracle can re-derive signatures and is timed
        # separately for reference
        ("q28_minhash_xxhash64", q.bench_minhash_xxhash64),
        ("q28_minhash_md5_oracle", q.QUERY_FNS["q28_minhash_neardup"]),
    ]
    for name, fn in batch:
        dt, steal, busy = run_leg(
            lambda att, fn=fn: lambda: fn(spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            retries,
            name,
            contaminated,
        )
        record(name, dt, steal, busy, stream=False)

    shutil.rmtree(work, ignore_errors=True)
    total = round(sum(times.values()), 3)
    j1, i1, s1 = _cpu_jiffies()
    ncpu = os.cpu_count() or CPUS
    box = {
        "launch_gate": gate,
        "loadavg_before": [round(v, 2) for v in load_before],
        "busy_cores_avg_during": round((1 - (i1 - i0) / (j1 - j0)) * ncpu, 1),
        "stolen_cores_avg_during": round((s1 - s0) / (j1 - j0) * ncpu, 2),
        "per_leg": leg_box,
        "retried_legs": retries,
    }
    compact = {
        "metric": "headline_suite_wall_sec (streaming session/turn-order/join/e2e-sink + batch ops)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cores": CPUS,
        "stream_turns": n_turns,
        "turns_per_sec": tps,
    }
    if contaminated:
        # sustained neighbor-steal survived retry+cooldown on these
        # legs; report the headline both ways so a 32s stolen
        # composite cannot masquerade as a 2.3x engine regression
        compact["contaminated_legs"] = sorted(contaminated)
        compact["value_excl_contaminated"] = round(
            sum(v for k, v in times.items() if k not in contaminated), 3
        )
    # Truncation-proofing (VERDICT r05 "What's wrong #2": the driver
    # artifact captures only the TAIL of stdout, and box/retry detail
    # once grew the single line until metric/value/queries fell off).
    # Verbose detail goes on its own EARLIER line + a BENCH/ file; the
    # compact metric line is printed LAST with nothing after it.
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        os.makedirs(os.path.join(here, "BENCH"), exist_ok=True)
        with open(os.path.join(here, "BENCH", "last_run_full.json"), "w") as f:
            json.dump({**compact, "box": box}, f, indent=1)
    except OSError:
        pass
    print(json.dumps({"box_detail": box}))
    sys.stdout.flush()
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
