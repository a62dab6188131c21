"""Per-key time-series features (exponentially-weighted moving stats).

Feature pipelines over event logs need recency-weighted aggregates —
"this user's exponentially-decayed average spend" — which look
recursive (e_i = a*x_i + (1-a)*e_{i-1}) and tempt a per-key Python
loop. They are not: the recursion has a closed form, so the whole
computation stays in Catalyst window/aggregate expressions (whole-
stage codegen, zero Python).

    e_n = sum_i w_i * x_i,   w_1 = (1-a)^(n-1),
                             w_i = a * (1-a)^(n-i)  for i >= 2

Scale: one shuffle on the key for the window; weights underflow to
IEEE zero beyond ~1e3 steps at any practical alpha, so old history
contributes exactly nothing. Partitions are per-key — the assumed
grain (events per user / sensor) is bounded; for an unbounded hot key
pre-aggregate to a coarser tick first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ewma_by_key"]


def ewma_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Final-state EWMA of ``value_col`` per key, rows ordered by
    (ts, tiebreak). Returns one row per key: n_events, last value and
    the EWMA, both reported in basis points (floor(x*1e4 + 0.5) as
    BIGINT) so a SQL oracle hash-matches despite float summation-order
    noise."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    wall = Window.partitionBy(key_col)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wall)
    one_m_a = F.lit(1.0 - alpha)
    weight = F.when(rn == 1, F.pow(one_m_a, n - 1)).otherwise(
        F.lit(alpha) * F.pow(one_m_a, n - rn)
    )
    x = F.col(value_col).cast("double")
    bp = lambda c: F.floor(c * 10_000 + F.lit(0.5)).cast("long")  # noqa: E731
    return (
        df.select(
            F.col(key_col),
            (weight * x).alias("_wx"),
            F.when(rn == n, x).alias("_last"),
        )
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            bp(F.max("_last")).alias("last_value_bp"),
            bp(F.sum("_wx")).alias("ewma_bp"),
        )
    )
