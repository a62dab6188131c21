#!/usr/bin/env python3
"""Time every registered query with the noop sink (guide §1.4) at the
gate scale factor — the optimization-round coverage sweep. One line per
query to stdout + BENCH/sweep_queries.json."""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quanta_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("QS_SWEEP_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from quanta_spark import queries as q

    spark = get_spark(app_name="qs_sweep", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    out: dict[str, float | str] = {}
    names = list(q.QUERY_FNS)
    only = sys.argv[1:]
    if only:
        names = [n for n in names if any(s in n for s in only)]
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            df = q.QUERY_FNS[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 2)
            out[name] = dt
            print(f"{name:45s} {dt:8.2f}s", flush=True)
        except Exception as exc:  # noqa: BLE001
            out[name] = f"ERR {type(exc).__name__}: {exc}"[:200]
            print(f"{name:45s} ERROR {exc}", flush=True)
            traceback.print_exc(limit=2)
    spark.sparkContext.setJobDescription(None)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/sweep_queries.json", "w") as f:
        json.dump({"sf_dir": SF_DIR, "wall_sec": out}, f, indent=1)
    timed = {k: v for k, v in out.items() if isinstance(v, float)}
    print(f"\ntotal {sum(timed.values()):.1f}s over {len(timed)} queries; errors: "
          f"{[k for k, v in out.items() if isinstance(v, str)]}")
    for k, v in sorted(timed.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  slowest: {k:42s} {v:7.2f}s")


if __name__ == "__main__":
    main()
