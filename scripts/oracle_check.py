"""Dev utility: run named queries() entries against their DuckDB
oracles exactly like the driver's correctness gate (and like
tests/test_oracle_parity.py, whose normalization this reuses).

Usage: python scripts/oracle_check.py q42_approx_stats q31_media_decode
       python scripts/oracle_check.py --all
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import pandas as pd

import __spark_entry__ as entrymod
from quanta_spark.session import get_spark

SF_DIR = os.environ.get("QS_ORACLE_SF", "/root/testdata/sf0.01")


from oracle_compare import duck_frame, normalize as _normalize


def _duck(sql: str) -> pd.DataFrame:
    return duck_frame(sql, SF_DIR)


def main() -> int:
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:]
    if names == ["--all"]:
        names = [n for n in queries if not n.startswith(("q32", "q33"))]
    spark = get_spark(app_name="oracle_check", cores=8, shuffle_partitions=8)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            got = _normalize(queries[name](spark, SF_DIR).toPandas())
            if name not in oracles:
                print(f"{name}: NO_ORACLE rows={len(got)} ({time.time()-t0:.1f}s)")
                continue
            want = _normalize(_duck(oracles[name]), strict_tz=True)
            assert list(got.columns) == list(want.columns), (
                f"columns {list(got.columns)} != {list(want.columns)}"
            )
            assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
            pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9, rtol=0)
            print(f"{name}: OK rows={len(got)} ({time.time()-t0:.1f}s)")
        except Exception as exc:
            failed.append(name)
            msg = str(exc).replace("\n", " | ")[:800]
            print(f"{name}: FAIL ({time.time()-t0:.1f}s) {msg}")
    print(f"\n{len(names)-len(failed)}/{len(names)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
