#!/usr/bin/env python3
"""One-off worker-side sampling profile of the turn-order leg
(optimization round instrumentation; guide §4.6 — see what a UDF is
doing). Wraps _order_fn with a per-process stack sampler writing
aggregated samples to /tmp/qs_prof/<pid>.txt."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, _sf_of, bench_input, run_stream  # noqa: E402
from quanta_spark.session import get_spark  # noqa: E402

PROF_DIR = "/tmp/qs_prof"


def make_op():
    from pyspark.sql.streaming.state import GroupStateTimeout

    from quanta_spark.operators import stateful

    orig = stateful._order_fn

    def wrapped(key, it, state):
        _ensure_sampler()
        yield from orig(key, it, state)

    def _ensure_sampler():
        import collections
        import threading
        import time as _t

        pid = os.getpid()
        flag = f"_qs_sampler_{pid}"
        g = globals()
        if g.get(flag):
            return
        g[flag] = True
        main_id = threading.main_thread().ident
        counts = collections.Counter()

        def sample():
            t_last = _t.time()
            while True:
                _t.sleep(0.004)
                frames = sys._current_frames()
                f = frames.get(main_id)
                stack = []
                d = 0
                while f is not None and d < 6:
                    stack.append(f"{os.path.basename(f.f_code.co_filename)}:{f.f_code.co_name}:{f.f_lineno}")
                    f = f.f_back
                    d += 1
                counts[" <- ".join(stack)] += 1
                if _t.time() - t_last > 1.0:
                    t_last = _t.time()
                    with open(os.path.join(PROF_DIR, f"{pid}.txt"), "w") as fh:
                        for k, v in counts.most_common(40):
                            fh.write(f"{v}\t{k}\n")

        th = threading.Thread(target=sample, daemon=True)
        th.start()

    def op(src):
        return (
            src.withWatermark("ts", "1 hour")
            .groupBy("conv_id")
            .applyInPandasWithState(
                wrapped,
                outputStructType=stateful.ORDERED_OUTPUT_SCHEMA,
                stateStructType=stateful._STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )

    return op


def main() -> None:
    shutil.rmtree(PROF_DIR, ignore_errors=True)
    os.makedirs(PROF_DIR, exist_ok=True)
    spark = get_spark(app_name="qs_to_prof", cores=CPUS, shuffle_partitions=CPUS)
    data_dir, n_turns = bench_input(_sf_of(SF_DIR))
    import time
    t0 = time.perf_counter()
    run_stream(spark, data_dir, make_op(), f"/tmp/qs_to_prof_ck_{os.getpid()}")
    print(f"leg wall: {time.perf_counter() - t0:.2f}s")
    # aggregate
    import collections
    agg = collections.Counter()
    for f in os.listdir(PROF_DIR):
        for line in open(os.path.join(PROF_DIR, f)):
            v, k = line.rstrip("\n").split("\t", 1)
            agg[k] += int(v)
    total = sum(agg.values())
    print(f"total samples: {total}")
    for k, v in agg.most_common(25):
        print(f"{v/total*100:5.1f}%  {k}")


if __name__ == "__main__":
    main()
