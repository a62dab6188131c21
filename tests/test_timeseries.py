"""EWMA features (operators/timeseries.py): closed-form weighted sum
must equal the literal recursion, ties ordered by the tiebreak, and
alpha=1 degenerates to the last value."""

from __future__ import annotations

from datetime import datetime

import pytest

from quanta_spark.operators.timeseries import ewma_by_key


def _rows(vals, key=1):
    return [
        (key, i, datetime(2024, 1, 1, 0, 0, i), float(v)) for i, v in enumerate(vals)
    ]


SCHEMA = "user_id int, event_id int, ts timestamp, value double"


def _recursive_ewma(vals, a):
    e = vals[0]
    for x in vals[1:]:
        e = a * x + (1 - a) * e
    return e


@pytest.mark.parametrize("alpha", [0.5, 0.2])
def test_ewma_matches_literal_recursion(spark, alpha):
    vals = [10.0, 20.0, 5.0, 40.0, 1.0]
    df = spark.createDataFrame(_rows(vals), SCHEMA)
    row = ewma_by_key(df, alpha=alpha).collect()[0]
    want = _recursive_ewma(vals, alpha)
    assert row["n_events"] == 5
    assert row["last_value_bp"] == 1_0000
    assert row["ewma_bp"] == int(want * 10_000 + 0.5)


def test_ewma_alpha_one_is_last_value(spark):
    df = spark.createDataFrame(_rows([3.0, 9.0, 2.5]), SCHEMA)
    row = ewma_by_key(df, alpha=1.0).collect()[0]
    assert row["ewma_bp"] == row["last_value_bp"] == 25_000


def test_ewma_orders_ties_by_tiebreak(spark):
    # two rows share a timestamp: event_id must break the tie, so the
    # "last" value is the higher event_id's
    ts = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 2, ts, 100.0), (1, 1, ts, 1.0)], SCHEMA
    )
    row = ewma_by_key(df, alpha=0.5).collect()[0]
    assert row["last_value_bp"] == 100_0000
    assert row["ewma_bp"] == int((0.5 * 100.0 + 0.5 * 1.0) * 10_000 + 0.5)


def test_ewma_rejects_bad_alpha(spark):
    df = spark.createDataFrame(_rows([1.0]), SCHEMA)
    with pytest.raises(ValueError, match="alpha"):
        ewma_by_key(df, alpha=0.0)
