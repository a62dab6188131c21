#!/usr/bin/env python3
"""Optimization-round instrumentation harness (guide §1: measure first).

NOT the driver bench — bench.py is frozen for measurement. This file
isolates individual legs with the noop sink / listener metrics so each
change can be judged on its own numbers:

  python bench_extra.py stream  [legs...]   # streaming legs, per-batch durations
  python bench_extra.py batch   [legs...]   # batch legs, noop-timed, 2 reps
  python bench_extra.py explain [legs...]   # write plans/r07/<leg>.txt
  python bench_extra.py prep                # cost of queries._prepare re-registration

Env knobs (all optional):
  QS_X_PROVIDER   rocksdb|hdfs      state store provider for stream legs
  QS_X_CONF       k=v,k=v           extra SQL confs set before legs run
  QS_X_REPS       int               repetitions per leg (default 2)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import CPUS, SF_DIR, _cpu_jiffies, _sf_of, bench_input, run_e2e_sink, run_stream  # noqa: E402
from quanta_spark.operators.stateful import (  # noqa: E402
    enforce_turn_order,
    join_user_replies,
    reply_session_stats,
)
from quanta_spark.operators.windows import sessionize  # noqa: E402
from quanta_spark.session import get_spark  # noqa: E402
from quanta_spark.streaming.engine import attach_metrics  # noqa: E402

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

STREAM_LEGS = {
    "stream_session": lambda src: sessionize(src, gap="30 minutes", watermark="1 hour"),
    "stream_turn_order": lambda src: enforce_turn_order(src, watermark="1 hour"),
    "stream_reply_join": lambda src: join_user_replies(src, watermark="1 hour"),
    "stream_composite": lambda src: reply_session_stats(src, watermark="1 hour"),
}

BATCH_LEGS = [
    "q01_pricing_summary",
    "q03_regional_revenue",
    "q13_session_windows",
    "q16_two_phase_conv_stats",
    "q21_exact_dedup",
    "q22_ngram_jaccard",
    "q27_cosine_topk",
    "q28_minhash_xxhash64",
    "q28_minhash_md5_oracle",
]


def _leg_steal(fn):
    ncpu = os.cpu_count() or CPUS
    j0, _, s0 = _cpu_jiffies()
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    j1, _, s1 = _cpu_jiffies()
    steal = (s1 - s0) / max(j1 - j0, 1) * ncpu
    return dt, steal


def _spark():
    extra = {}
    prov = os.environ.get("QS_X_PROVIDER")
    if prov == "hdfs":
        extra["spark.sql.streaming.stateStore.providerClass"] = _HDFS
    for kv in filter(None, os.environ.get("QS_X_CONF", "").split(",")):
        k, v = kv.split("=", 1)
        extra[k] = v
    return get_spark(app_name="qs_bench_extra", cores=CPUS, shuffle_partitions=CPUS, extra_conf=extra)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "stream"
    only = sys.argv[2:]
    reps = int(os.environ.get("QS_X_REPS", "2"))
    sf = _sf_of(SF_DIR)
    spark = _spark()
    data_dir, n_turns = bench_input(sf)
    work = f"/tmp/qs_bx_{os.getpid()}"
    os.makedirs(work, exist_ok=True)
    out: dict = {"mode": mode, "sf": sf, "conf": {
        "provider": os.environ.get("QS_X_PROVIDER", "rocksdb"),
        "extra": os.environ.get("QS_X_CONF", "")}}

    if mode == "prep":
        from quanta_spark import queries as q
        for i in range(4):
            t0 = time.perf_counter()
            q._prepare(spark, SF_DIR)
            print(f"prepare rep{i}: {time.perf_counter() - t0:.3f}s")
        return

    if mode == "stream":
        listener = attach_metrics(spark)
        # warm the streaming machinery once (same stance as bench.py)
        from quanta_spark.datagen import GenSpec, generate, write_heartbeat_file, write_transcripts
        import pandas as pd
        warm_dir = "/tmp/qs_bench_warmup_v2"
        if not os.path.exists(os.path.join(warm_dir, "_DONE")):
            shutil.rmtree(warm_dir, ignore_errors=True)
            warm_spec = GenSpec(n_convs=60, mean_turns=8, seed=11)
            write_transcripts(warm_dir, warm_spec, n_files=2)
            wpdf = generate(warm_spec)
            write_heartbeat_file(warm_dir, wpdf["ts"].max() + pd.Timedelta(days=30))
            open(os.path.join(warm_dir, "_DONE"), "w").close()
        run_stream(spark, warm_dir, lambda src: reply_session_stats(src, watermark="1 hour"),
                   os.path.join(work, "warmup"))
        legs = {k: v for k, v in STREAM_LEGS.items() if not only or k in only}
        res = {}
        for name, op in legs.items():
            samples = []
            for r in range(reps):
                n0 = len(listener.progress)
                dt, steal = _leg_steal(lambda: run_stream(
                    spark, data_dir, op, os.path.join(work, f"{name}_r{r}")))
                batches = listener.progress[n0:]
                samples.append({
                    "wall": round(dt, 3), "steal": round(steal, 2),
                    "batches": [
                        {"rows": b["numInputRows"],
                         "durationMs": b["durationMs"],
                         "state": [
                             {k: s.get(k) for k in ("numRowsTotal", "numRowsUpdated")}
                             for s in b.get("stateOperators", [])]}
                        for b in batches],
                })
                print(f"{name} rep{r}: {dt:.2f}s steal={steal:.2f}")
            res[name] = samples
        if not only or "stream_e2e_sink" in only:
            samples = []
            for r in range(reps):
                dt, steal = _leg_steal(lambda: run_e2e_sink(
                    spark, data_dir, os.path.join(work, f"e2e_r{r}")))
                samples.append({"wall": round(dt, 3), "steal": round(steal, 2)})
                print(f"stream_e2e_sink rep{r}: {dt:.2f}s steal={steal:.2f}")
            res["stream_e2e_sink"] = samples
        out["legs"] = res

    elif mode in ("batch", "explain"):
        from quanta_spark import queries as q
        legs = [n for n in BATCH_LEGS if not only or n in only]
        res = {}
        os.makedirs("plans/r07", exist_ok=True)
        for name in legs:
            fn = q.bench_minhash_xxhash64 if name == "q28_minhash_xxhash64" else q.QUERY_FNS[
                name if name != "q28_minhash_md5_oracle" else "q28_minhash_neardup"]
            if mode == "explain":
                df = fn(spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(f"plans/r07/{name}.txt", "w") as f:
                    f.write(plan)
                print(f"{name}: plan -> plans/r07/{name}.txt ({plan.count('Exchange')} Exchange refs)")
                continue
            samples = []
            for r in range(reps):
                spark.sparkContext.setJobDescription(f"{name} rep{r}")
                dt, steal = _leg_steal(
                    lambda: fn(spark, SF_DIR).write.format("noop").mode("overwrite").save())
                samples.append({"wall": round(dt, 3), "steal": round(steal, 2)})
                print(f"{name} rep{r}: {dt:.2f}s steal={steal:.2f}")
            spark.sparkContext.setJobDescription(None)
            res[name] = samples
        out["legs"] = res

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs("BENCH", exist_ok=True)
    tag = os.environ.get("QS_X_TAG", "x")
    path = f"BENCH/extra_{mode}_{tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
