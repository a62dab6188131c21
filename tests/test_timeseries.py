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


def test_psi_drift_matches_hand_computation(spark):
    """Two days, one key, 2 bins: PSI against the hand formula with
    add-one smoothing; day 1 has no predecessor -> NULL psi."""
    import math
    from datetime import datetime

    from quanta_spark.operators.timeseries import psi_drift

    d1, d2 = datetime(2024, 1, 1, 5), datetime(2024, 1, 2, 7)
    # day1: 3 low, 1 high; day2: 1 low, 3 high (drift!)
    rows = (
        [(i, d1, "click", 10.0) for i in range(3)]
        + [(3, d1, "click", 80.0)]
        + [(4, d2, "click", 10.0)]
        + [(i, d2, "click", 80.0) for i in range(5, 8)]
    )
    df = spark.createDataFrame(
        rows, "event_id int, ts timestamp, event_type string, value double"
    )
    out = {r["day"].day: r for r in psi_drift(df, lo=0.0, hi=100.0, n_bins=2).collect()}
    assert out[1]["psi_bp"] is None
    p = [(1 + 1) / 6, (3 + 1) / 6]          # day2 smoothed probs
    q = [(3 + 1) / 6, (1 + 1) / 6]          # day1 smoothed probs
    want = sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))
    assert out[2]["psi_bp"] == int(want * 10_000 + 0.5)
    assert out[2]["n_rows"] == 4


def test_psi_drift_gap_days_not_compared(spark):
    """A 2-day gap between observations must NOT produce a psi (only
    consecutive days compare)."""
    from datetime import datetime

    from quanta_spark.operators.timeseries import psi_drift

    rows = [(1, datetime(2024, 1, 1), "e", 10.0), (2, datetime(2024, 1, 3), "e", 10.0)]
    df = spark.createDataFrame(
        rows, "event_id int, ts timestamp, event_type string, value double"
    )
    out = psi_drift(df, lo=0.0, hi=100.0, n_bins=2).collect()
    assert all(r["psi_bp"] is None for r in out)


def test_psi_drift_identical_days_zero(spark):
    from datetime import datetime

    from quanta_spark.operators.timeseries import psi_drift

    rows = [
        (i, datetime(2024, 1, d), "e", float(v))
        for d in (1, 2)
        for i, v in enumerate([5.0, 5.0, 95.0])
    ]
    df = spark.createDataFrame(
        rows, "event_id int, ts timestamp, event_type string, value double"
    )
    out = {r["day"].day: r["psi_bp"] for r in psi_drift(df, lo=0.0, hi=100.0, n_bins=2).collect()}
    assert out[2] == 0
