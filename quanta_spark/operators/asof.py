"""As-of join: attach to each event the most recent preceding row of
another stream (the classic enrich-with-latest-state operator Spark
lacks natively — pyspark guide 'common OLAP patterns').

Transcript instantiation: each tool turn joined to the most recent
user turn at-or-before it in the same conversation — "which user
request triggered this tool call".

Plan shape (scale posture): equi-join on conv_id bounded by a time
horizon + windowed pick of the latest match. The horizon bound keeps
the join's per-key fan-in constant (without it, an as-of join over a
mega-conversation degenerates to O(n^2) candidate pairs); the
DuckDB oracle uses its native ASOF JOIN, so parity also validates our
composition against a reference implementation of the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_tool_to_user(
    df: DataFrame, horizon: str = "2 hours"
) -> DataFrame:
    """For every tool turn, the latest user turn with user_ts <= tool_ts
    within ``horizon``. Deterministic: ties broken by user turn_idx."""
    tools = df.filter(F.col("role") == "tool").select(
        "conv_id",
        F.col("turn_idx").alias("tool_turn_idx"),
        F.col("tool").alias("tool_name"),
        F.col("ts").alias("tool_ts"),
    )
    users = df.filter(F.col("role") == "user").select(
        F.col("conv_id").alias("u_conv_id"),
        F.col("turn_idx").alias("user_turn_idx"),
        F.col("ts").alias("user_ts"),
    )
    cand = tools.join(
        users,
        (tools.conv_id == users.u_conv_id)
        & (users.user_ts <= tools.tool_ts)
        & (users.user_ts >= tools.tool_ts - F.expr(f"INTERVAL {horizon}")),
        "inner",
    )
    w = Window.partitionBy("conv_id", "tool_turn_idx").orderBy(
        F.col("user_ts").desc(), F.col("user_turn_idx").desc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "conv_id",
            "tool_turn_idx",
            "tool_name",
            "tool_ts",
            "user_turn_idx",
            "user_ts",
        )
    )


MAX_INTERVAL_FANOUT = 4096


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: str = "auto",
) -> DataFrame:
    """Generic point-in-interval (range) join WITHOUT an equi key —
    the join Catalyst would otherwise plan as BroadcastNestedLoopJoin
    (a full cross product at 10^12 rows). The standard rewrite: pick a
    time-bucket width near the typical interval length, explode each
    interval to the buckets it covers, map each point to its single
    bucket, EQUI-join on the bucket, then apply the exact containment
    filter. Every matching pair shares exactly the point's bucket, so
    no dedup is needed; an interval's fan-out is bounded by
    ceil(duration / bucket) + 1.

    ``bucket="auto"`` (default, VERDICT r04 ask #6) derives the width
    from the data with ONE O(1)-row aggregate: the median interval
    duration (typical fan-out ~2 buckets/interval), floored so the
    LONGEST interval explodes to at most MAX_INTERVAL_FANOUT rows —
    a degenerate mix (week-long tails under minute-scale medians)
    cannot melt an executor. Auto therefore needs a BATCH intervals
    side (the derivation is an eager aggregate); with an explicit
    ``bucket`` the plan stays fully lazy (streaming intervals work)
    and the cap is enforced EXACTLY, per interval, inside the explode
    expression — an interval spanning more than MAX_INTERVAL_FANOUT
    buckets fails the job loudly instead of silently melting an
    executor.

    Inclusive on both ends (ts BETWEEN start AND end). Returns
    points x matching-interval rows with all columns of both sides."""
    if bucket == "auto":
        if intervals.isStreaming:
            raise ValueError(
                "interval_join: bucket='auto' derives the width with an "
                "eager aggregate, which requires a BATCH intervals side; "
                "pass an explicit bucket (e.g. '1 hour') for a streaming "
                "intervals DataFrame"
            )
        # persist: the width aggregate below would otherwise recompute
        # the full intervals plan a second time when the join runs
        # (ADVICE r05 — in q98 that re-ran sessionization twice)
        intervals = intervals.persist()
        dur_s = F.unix_timestamp(
            F.col(end_col).cast("timestamp")
        ) - F.unix_timestamp(F.col(start_col).cast("timestamp"))
        stats = intervals.agg(
            F.percentile_approx(dur_s, 0.5).alias("med_s"),
            F.max(dur_s).alias("max_s"),
        ).collect()[0]
        med_s = int(stats["med_s"] or 0)
        max_s = int(stats["max_s"] or 0)
        # median => typical interval spans ~2 buckets; floor so the
        # longest interval stays under the fan-out cap; never below 1s
        w = max(med_s, -(-max_s // (MAX_INTERVAL_FANOUT - 1)), 1)
    else:
        n, unit = bucket.split()
        mult = {
            "second": 1, "seconds": 1,
            "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600,
            "day": 86400, "days": 86400,
        }
        if unit not in mult:
            raise ValueError(
                f"interval_join: unsupported bucket unit {unit!r}; "
                "use seconds/minutes/hours/days"
            )
        w = int(n) * mult[unit]
    p = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(point_ts).cast("timestamp")) / w)
    )
    s = F.floor(F.unix_timestamp(F.col(start_col).cast("timestamp")) / w)
    e = F.floor(F.unix_timestamp(F.col(end_col).cast("timestamp")) / w)
    span = e - s + F.lit(1)
    buckets = F.when(
        span > MAX_INTERVAL_FANOUT,
        F.raise_error(
            F.format_string(
                "interval_join: interval spans %s buckets > "
                f"MAX_INTERVAL_FANOUT={MAX_INTERVAL_FANOUT} at "
                f"bucket width {w}s; pass a wider bucket",
                span,
            )
        ).cast("array<bigint>"),
    ).otherwise(F.sequence(s, e))
    iv = intervals.withColumn("_b", F.explode(buckets))
    joined = p.join(iv, "_b").filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_b")


def scd2_asof_join(
    points: DataFrame,
    history: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    how: str = "left",
) -> DataFrame:
    """Point-in-time-correct enrichment against an SCD Type-2 history
    (timeseries.scd2_history output): each point row picks up the
    version valid AT its event time — ``valid_from <= ts < valid_to``
    with a NULL ``valid_to`` meaning the open current version. Points
    before the key's first version keep NULL attributes (``how='left'``,
    the audit-friendly default: enrichment never drops events).

    Works identically on a batch points side and on a STREAMING points
    side (stream-static join — stateless, no watermark needed: the
    history is a bounded dimension). At warehouse scale the history is
    O(changes), usually broadcastable; if not, the equi half of the
    condition (the key) still drives a shuffle hash join and the range
    predicates evaluate as join residuals — never a cross product.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    h = history.select(
        F.col(key_col).alias("_h_key"),
        *[c for c in history.columns if c != key_col],
    )
    ts = F.col(ts_col).cast("timestamp")
    cond = (
        (F.col("_h_key") == F.col(key_col))
        & (ts >= F.col("valid_from").cast("timestamp"))
        & (F.col("valid_to").isNull() | (ts < F.col("valid_to").cast("timestamp")))
    )
    return points.join(h, cond, how).drop("_h_key")
