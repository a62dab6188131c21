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

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from quanta_spark.session import get_spark

SF_DIR = os.environ.get("QS_ORACLE_SF", "/root/testdata/sf0.01")


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in entrymod.q.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame, *, strict_tz: bool = False) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if strict_tz and isinstance(s.dtype, pd.DatetimeTZDtype):
                # mirror tests/test_oracle_parity.py: the driver gate is
                # schema-strict, so an oracle emitting TIMESTAMPTZ must
                # fail here too instead of being normalized away.
                raise AssertionError(
                    f"oracle column {c!r} is tz-aware ({s.dtype}); use "
                    "CAST(... AS TIMESTAMP) or make_timestamp() in the oracle"
                )
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        else:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


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
