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
