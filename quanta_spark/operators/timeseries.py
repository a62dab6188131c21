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


def psi_drift(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "event_type",
    ts_col: str = "ts",
    lo: float = 0.0,
    hi: float = 500.0,
    n_bins: int = 10,
) -> DataFrame:
    """Population-stability-index drift monitor: per key and 1-day
    window, the PSI of ``value_col``'s binned distribution against the
    PREVIOUS day's —

        PSI = sum_i (p_i - q_i) * ln(p_i / q_i)

    with add-one smoothing (p_i = (c_i + 1) / (n + n_bins)), the
    standard alarm for feature/score drift between a model's training
    window and live traffic. Days with no predecessor emit NULL psi.

    Scale: ONE scan aggregates to the (key, day, bin) count table
    (map-side partial); everything after — densify bins, lag-join the
    previous day, the log-sum — runs on that compact table (O(keys x
    days x bins) rows). Values clamp into [lo, hi); psi is reported in
    basis points (floor(x*1e4+0.5), x >= 0) so ULP-level ln noise
    cannot flip a hash compare."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    width = (hi - lo) / n_bins
    bin_c = F.least(
        F.greatest(
            F.floor((F.col(value_col).cast("double") - lo) / width).cast("int"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    day = F.date_trunc("day", F.col(ts_col))
    counts = (
        df.select(F.col(key_col).alias("key"), day.alias("day"), bin_c.alias("bin"))
        .groupBy("key", "day", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # densify: every (key, day) x bin, so empty bins smooth to 1/(n+B)
    days = counts.select("key", "day").distinct()
    grid = days.crossJoin(
        counts.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    )
    dense = grid.join(counts, ["key", "day", "bin"], "left").select(
        "key", "day", "bin", F.coalesce("c", F.lit(0)).alias("c")
    )
    totals = dense.groupBy("key", "day").agg(F.sum("c").alias("n"))
    probs = dense.join(totals, ["key", "day"]).select(
        "key",
        "day",
        "bin",
        "n",
        ((F.col("c") + 1) / (F.col("n") + n_bins)).alias("p"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("key", "bin").orderBy("day")
    lagged = probs.select(
        "key",
        "day",
        "bin",
        "n",
        "p",
        F.lag("p").over(w).alias("q"),
        (F.datediff("day", F.lag("day").over(w)) == 1).alias("_adj"),
    )
    term = F.when(
        F.col("q").isNotNull() & F.col("_adj"),
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")),
    )
    return (
        lagged.groupBy("key", "day")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.floor(F.sum(term) * 10_000 + F.lit(0.5)).cast("long").alias("psi_bp"),
        )
        .withColumnRenamed("key", key_col)
    )
