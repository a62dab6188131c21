"""Incremental rollup maintenance — continuous aggregates kept fresh
by merging DELTAS, never rescanning raw history.

The 100 TB pattern (TimescaleDB continuous aggregates / Iceberg
incremental MERGE, and the batch twin of the repo's streaming
continuous aggregates, stateful.py::stream_gapfill_locf /
stream_topk_terms): a persisted rollup table holds one row of
MERGEABLE aggregate state per group — count, fixed-point sum, min,
max, and an optional Datasketches HLL for distinct counts — and each
ingest cycle folds the new batch in as

    rollup(history UNION delta) == rollup_merge(rollup_history,
                                                rollup_aggregate(delta))

which touches O(delta rows + groups), not O(history rows).

Every stored statistic is chosen for merge-exactness across engines
and partitionings:

- ``n``      row count (BIGINT, associative +)
- ``sum_e6`` sum of floor(value*1e6 + 0.5) (BIGINT — per-row quantize
  THEN integer sum, so two engines / any shuffle order agree exactly;
  float sums would drift per partitioning)
- ``min_v`` / ``max_v`` actual input values (least/greatest skip
  nulls, so a group absent from one side passes through unchanged)
- ``hll``    Spark Datasketches HLL binary (``hll_union`` is the
  sketch's native merge; estimates are checked against exact counts
  in the gate, never hash-compared)

``rollup_merge`` is a FULL OUTER JOIN on the group keys, not a
union+groupBy: with the history rollup persisted bucketed on the keys
(plans/bucketing.py::write_bucketed), the scan's hash distribution
already satisfies the join requirement, so the only exchange in the
merge plan is the (small) delta side — history never reshuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rollup_aggregate", "rollup_merge", "ROLLUP_METRICS"]

#: metric columns every rollup row carries (hll only when requested)
ROLLUP_METRICS = ("n", "sum_e6", "min_v", "max_v")


def rollup_aggregate(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    value_col: str = "value",
    distinct_col: str | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """One mergeable-rollup row per group of ``keys``. Null/NaN values
    and null keys are dropped (a rollup over them is undefined in
    every engine pair)."""
    keys = list(keys)
    if not keys:
        raise ValueError("rollup_aggregate: keys must be non-empty")
    v = F.col(value_col).cast("double")
    cond = v.isNotNull() & ~F.isnan(v)
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(v * 1e6 + F.lit(0.5)).cast("long")).alias("sum_e6"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias("hll"))
    return df.filter(cond).groupBy(*keys).agg(*aggs)


def _merged(h: Column, d: Column, combine) -> Column:
    return (
        F.when(h.isNull(), d).when(d.isNull(), h).otherwise(combine(h, d))
    )


def rollup_merge(history: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta rollup into the history rollup (both produced by
    :func:`rollup_aggregate` with the same keys/options). Groups only
    in one side pass through bit-unchanged; shared groups combine each
    metric by its native merge (+, +, least, greatest, hll_union).
    Associative and commutative, so any ingest order and any shuffle
    partitioning computes the same table."""
    if set(history.columns) != set(delta.columns):
        raise ValueError(
            "rollup_merge: history and delta schemas differ: "
            f"{sorted(history.columns)} vs {sorted(delta.columns)}"
        )
    has_hll = "hll" in history.columns
    metrics = set(ROLLUP_METRICS) | ({"hll"} if has_hll else set())
    keys = [c for c in history.columns if c not in metrics]
    if not keys:
        raise ValueError("rollup_merge: no key columns found")
    h, d = history.alias("h"), delta.alias("d")
    out = [
        F.coalesce(F.col(f"h.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ] + [
        _merged(F.col("h.n"), F.col("d.n"), lambda a, b: a + b).alias("n"),
        _merged(
            F.col("h.sum_e6"), F.col("d.sum_e6"), lambda a, b: a + b
        ).alias("sum_e6"),
        F.least(F.col("h.min_v"), F.col("d.min_v")).alias("min_v"),
        F.greatest(F.col("h.max_v"), F.col("d.max_v")).alias("max_v"),
    ]
    if has_hll:
        out.append(
            _merged(F.col("h.hll"), F.col("d.hll"), F.hll_union).alias("hll")
        )
    cond = F.lit(True)
    for k in keys:  # keys are non-null by construction (rollup_aggregate)
        cond = cond & (F.col(f"h.{k}") == F.col(f"d.{k}"))
    return h.join(d, cond, "full_outer").select(*out)
