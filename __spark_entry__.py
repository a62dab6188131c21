"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke on sf0.001.
``queries()`` / ``oracle_sql()`` — the operator inventory's correctness
gate; implementations live in ``quanta_spark.queries`` (one entry per
operator from SURVEY.md §2 plus the training-data pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quanta_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derived transcripts -> uppercase stage chain ->
    session windows (the engine's headline pipeline, batch flavor)."""
    sf_dir = "/root/testdata/sf0.001"
    q._prepare(spark, sf_dir)

    from pyspark.sql import functions as F

    from quanta_spark.operators.stages import apply_chain
    from quanta_spark.operators.windows import sessionize

    t = q.transcripts_df(spark)
    upper = apply_chain(t, ["uppercase"]).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    return sessionize(upper, gap="30 minutes").orderBy(
        F.col("conv_id"), F.col("session_start")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(q.QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    return dict(q.ORACLES)
