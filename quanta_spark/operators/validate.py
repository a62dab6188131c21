"""Data-quality constraint validation (Deequ-style check suites).

At 100 TB you validate BEFORE you train: a schema-drifted feed, a
broken join key, or a silently-null column costs a full pipeline run.
This module runs a declarative check suite over a DataFrame and emits
one row per constraint — (check_name, n_violations, n_rows, passed) —
so the report itself is tiny (O(#checks)) regardless of input size,
mirroring the contract of Amazon Deequ / Great Expectations on Spark.

Scale shapes:
- every row-level check in a suite shares ONE scan (a single agg of
  conditional sums, all map-side partial — adding a 50th check adds an
  expression, not a pass);
- uniqueness is count vs count(distinct) — one shuffle on the key;
- referential integrity is a left-anti join count (broadcast when the
  reference side is a dimension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["validate_rows", "uniqueness_check", "referential_check", "constraint_report"]

_REPORT_COLS = ["check_name", "n_violations", "n_rows", "passed"]


def _finish(df: DataFrame) -> DataFrame:
    return df.select(
        "check_name",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def validate_rows(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Row-level checks: ``checks`` maps check_name -> VIOLATION
    predicate (true = row violates; a NULL predicate result is NOT a
    violation — SQL three-valued logic, so a null column fails its
    explicit isNull check, not every range check it appears in). All
    checks evaluate in one scan — a single aggregate of conditional
    sums (map-side partial), then a stack() unpivot of the 1-row
    result into the report shape."""
    if not checks:
        raise ValueError("validate_rows needs at least one check")
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in checks.items()
    ]
    row = df.agg(F.count(F.lit(1)).cast("long").alias("_n"), *aggs)
    stack_args = ", ".join(f"'{n}', `{n}`" for n in checks)
    return _finish(
        row.select(
            F.expr(
                f"stack({len(checks)}, {stack_args}) AS (check_name, n_violations)"
            ),
            F.col("_n").alias("n_rows"),
        )
    )


def uniqueness_check(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Key-uniqueness: n_violations = rows beyond the first per
    distinct key (count - count(distinct key)). One shuffle on the
    key; both counts partial-aggregate map-side."""
    name = name or "unique_" + "_".join(cols)
    row = df.agg(
        F.count(F.lit(1)).alias("_n"),
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])).alias(
            "_v"
        ),
    )
    return _finish(
        row.select(
            F.lit(name).alias("check_name"),
            F.col("_v").alias("n_violations"),
            F.col("_n").alias("n_rows"),
        )
    )


def referential_check(
    df: DataFrame,
    key: str,
    ref: DataFrame,
    ref_key: str,
    name: str | None = None,
    broadcast_ref: bool = True,
) -> DataFrame:
    """Referential integrity: n_violations = rows whose ``key`` has no
    match in ``ref.ref_key`` (NULL keys count as violations — an
    orphan is an orphan). Left-anti join; the reference side is
    broadcast by default (dimensions) — pass broadcast_ref=False for a
    fact-sized reference and let AQE pick the strategy."""
    name = name or f"ref_{key}_in_{ref_key}"
    ref_keys = ref.select(F.col(ref_key).alias("_rk")).distinct()
    if broadcast_ref:
        ref_keys = F.broadcast(ref_keys)
    orphans = df.join(ref_keys, df[key] == F.col("_rk"), "left_anti")
    row = df.agg(F.count(F.lit(1)).alias("_n")).crossJoin(
        orphans.agg(F.count(F.lit(1)).alias("_v"))
    )
    return _finish(
        row.select(
            F.lit(name).alias("check_name"),
            F.col("_v").alias("n_violations"),
            F.col("_n").alias("n_rows"),
        )
    )


def constraint_report(parts: list[DataFrame]) -> DataFrame:
    """Union per-check report fragments (each already in the report
    shape) into one suite result. Each fragment is O(1) rows, so the
    union is driver-cheap no matter the input scale."""
    if not parts:
        raise ValueError("constraint_report needs at least one fragment")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*_REPORT_COLS)


def stream_quality_monitor(
    df: DataFrame,
    checks: dict[str, Column],
    window: str = "1 day",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Data-quality monitoring ON THE INGEST STREAM: per event-time
    tumbling window, per check, violation counts — the alert feed that
    catches a schema-drifted producer within one window instead of one
    training run. Same check contract as :func:`validate_rows`
    (violation predicate, NULL = not a violation).

    Shape: ONE windowed aggregate in append mode (all checks are
    conditional sums inside it, map-side partial; state is O(open
    windows), each holding one row of counters — the stack() unpivot
    into (window_start, check_name, ...) rows runs AFTER the aggregate,
    so per-check fan-out never touches state). Watermark closes and
    emits windows exactly once."""
    if not checks:
        raise ValueError("stream_quality_monitor needs at least one check")
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in checks.items()
    ]
    agg = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("_w"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n"), *aggs)
    )
    stack_args = ", ".join(f"'{n}', `{n}`" for n in checks)
    return agg.select(
        F.col("_w.start").alias("window_start"),
        F.expr(f"stack({len(checks)}, {stack_args}) AS (check_name, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).withColumn("passed", F.col("n_violations") == 0)
