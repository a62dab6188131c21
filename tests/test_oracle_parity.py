"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same sf0.01 parquet, compare row count + (order-insensitive)
values. Queries without an oracle get a rows>=0 smoke check.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("QS_ORACLE_SF", "/root/testdata/sf0.01")

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()
# streaming e2e queries are exercised in test_streaming_queries (slow)
_SLOW = {"q32_stream_sessionize", "q33_stream_turn_order", "q46_stream_dedup", "q47_sink_roundtrip"}


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
                # The driver's gate is schema-strict: a DuckDB oracle that
                # emits TIMESTAMPTZ (e.g. bare to_timestamp()) fails its
                # schema+hash compare against Spark's plain TimestampType.
                # Fail here too so the replica predicts the driver.
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


@pytest.mark.parametrize("name", [n for n in _QUERIES if n not in _SLOW])
def test_query_matches_oracle(spark, name):
    got = _normalize(_QUERIES[name](spark, SF_DIR).toPandas())
    if name not in _ORACLES:
        assert len(got) >= 0  # rows-only contract for hash-seeded ops
        if name.startswith(("q28", "q29", "q30", "q31")):
            assert len(got) > 0, f"{name}: expected non-empty result"
        return
    want = _normalize(_duck(_ORACLES[name]), strict_tz=True)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9, rtol=0)


def test_no_bare_to_timestamp_in_oracles():
    """DuckDB to_timestamp() returns TIMESTAMPTZ, which fails the
    driver's schema-strict compare against Spark's plain TimestampType
    (CORRECTNESS_r04: q86/q89/q92/q95). Ban it outright — oracles use
    make_timestamp(us), which returns plain TIMESTAMP."""
    offenders = [n for n, sql in _ORACLES.items() if "to_timestamp(" in sql]
    assert offenders == [], f"oracles using to_timestamp(): {offenders}"


def test_gate_rotation_stalest_first():
    """The driver gates the first 50 queries() entries; the rotation must
    put never-gated and stalest-green queries first, deterministically."""
    names = list(entrymod.q.QUERY_FNS)
    order = entrymod._gate_order(names)
    assert sorted(order) == sorted(names)
    assert order == entrymod._gate_order(names), "rotation must be deterministic"
    # every query the repo has CORRECTNESS files for: a name green in an
    # older round must sort before one green only in a newer round
    import glob
    import json
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_green: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        rows = json.load(open(path))
        for n, row in rows.items():
            # shared predicate: the test must agree with production
            if entrymod._row_green(row):
                last_green[n] = max(last_green.get(n, 0), rnd)
    ranks = {n: i for i, n in enumerate(order)}
    for a in names:
        for b in names:
            if last_green.get(a, 0) < last_green.get(b, 0):
                assert ranks[a] < ranks[b], (a, b)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_SLOW))
def test_streaming_query_matches_oracle(spark, name):
    got = _normalize(_QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(_duck(_ORACLES[name]))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9, rtol=0)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "session_start" in df.columns
