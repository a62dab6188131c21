"""Shared gate-replica helpers: DuckDB oracle execution and the
normalization used to compare Spark results against oracles.

Single source of truth for tests/test_oracle_parity.py and
scripts/oracle_check.py — the two replicas of the driver's
correctness gate must always agree on what they accept (VERDICT r04:
a normalization divergence is exactly how four red driver rows passed
the local gate), so the logic lives once, here.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from quanta_spark.queries import TABLES


def duck_frame(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL on a fresh DuckDB connection with every parquet
    table in ``sf_dir`` registered as a view (the driver's setup)."""
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).df()


def normalize(df: pd.DataFrame, *, strict_tz: bool = False) -> pd.DataFrame:
    """Column-sorted, value-normalized, row-sorted frame for an
    order-insensitive compare. ``strict_tz=True`` (oracle side) fails
    loudly on tz-aware datetime columns: the driver's gate is
    schema-strict, so a DuckDB oracle emitting TIMESTAMPTZ (e.g. bare
    to_timestamp()) fails its schema+hash compare against Spark's
    plain TimestampType — the replica must predict that, never
    normalize it away (CORRECTNESS_r04: q86/q89/q92/q95)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if strict_tz and isinstance(s.dtype, pd.DatetimeTZDtype):
                raise AssertionError(
                    f"oracle column {c!r} is tz-aware ({s.dtype}); use "
                    "make_timestamp(us) or CAST(... AS TIMESTAMP) in the oracle"
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
