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


def _row_green(row: dict) -> bool:
    """The single definition of a green driver CORRECTNESS row, shared by
    the gate rotation and the test suite: no error, rows match, and
    neither schema nor hash explicitly failed (None = weaker rows-only
    contract for oracle-less ops, which still counts as green)."""
    return (
        row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
    )


def _gate_order(names: list[str]) -> list[str]:
    """Deterministic gate rotation: the driver's correctness gate checks
    the FIRST 50 entries of ``queries()``, but the registry is larger.
    Order queries by rounds-since-last-green-driver-row (stalest first,
    never-gated stalest of all; ties broken by canonical registration
    order), computed from the committed ``CORRECTNESS_r*.json`` files.
    Every registered operator then gets an independent driver row at
    least every ceil(len(registry)/50) rounds, and newly added operators
    gate immediately.
    """
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if _row_green(row):
                last_green[name] = max(last_green.get(name, 0), rnd)
    canon = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (last_green.get(n, 0), canon[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    order = _gate_order(list(q.QUERY_FNS))
    return {name: q.QUERY_FNS[name] for name in order}


def oracle_sql() -> dict[str, str]:
    order = _gate_order(list(q.QUERY_FNS))
    return {name: q.ORACLES[name] for name in order if name in q.ORACLES}
