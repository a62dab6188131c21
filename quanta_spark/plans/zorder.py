"""Z-order (Morton) clustering keys — lakehouse layout maintenance.

Multi-dimensional data skipping needs rows that are close in BOTH key
columns to land in the same file; sorting by (a, b) only localizes
``a``. The Z-value interleaves the bits of the two keys, so range
predicates on EITHER column prune most files. This module computes
deterministic z-values with pure integer Column arithmetic (16 terms
of shift/mask per dimension — whole-stage codegen, no Python, no UDF)
so a SQL oracle reproduces them bit-for-bit, plus the range-partition
step that turns them into a write layout.

Scale: the min/max normalization bounds are one O(1)-row aggregate;
everything else is a per-row expression and one range repartition —
the same cost as any sorted write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16


# the (col-lo)*65535 numerator must stay inside a signed 64-bit long
# (ANSI mode raises on overflow, but fail with a clear message first)
MAX_KEY_SPAN = ((1 << 63) - 1) // 65535


def _normalize16(col: Column, lo: int, hi: int) -> Column:
    """Map [lo, hi] -> [0, 65535] with EXACT integer floor division.
    The quotient is computed as a double first and then CORRECTED by
    comparing against the exact integer products — num can exceed
    2^53, where a binary64 division may truncate one-off vs an
    engine's integer ``//`` (both neighbors are checked, so the result
    is the true floor for any in-range span)."""
    span = max(hi - lo, 1)
    if span > MAX_KEY_SPAN:
        raise ValueError(
            f"key span {span} overflows the 16-bit rank arithmetic "
            f"(max {MAX_KEY_SPAN}); pre-scale the key (e.g. days, not "
            "microseconds) before z-ordering"
        )
    num = (col.cast("long") - F.lit(lo)) * F.lit(65535)
    q0 = (num / F.lit(span)).cast("long")
    too_low = (num - (q0 + 1) * F.lit(span)) >= 0
    too_high = (num - q0 * F.lit(span)) < 0
    return (
        q0 + F.when(too_low, 1).otherwise(0) - F.when(too_high, 1).otherwise(0)
    ).cast("long")


def _interleave(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two ``bits``-bit ints: x's bit i lands at
    position 2i, y's at 2i+1."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_keys(
    df: DataFrame, col_x: str, col_y: str, out_col: str = "z_value"
) -> DataFrame:
    """Append the Morton z-value of (col_x, col_y), both normalized to
    16-bit ranges via their global min/max (one bounded driver
    action). Integer-only, so cross-engine exact."""
    b = df.agg(
        F.min(F.col(col_x).cast("long")).alias("x_lo"),
        F.max(F.col(col_x).cast("long")).alias("x_hi"),
        F.min(F.col(col_y).cast("long")).alias("y_lo"),
        F.max(F.col(col_y).cast("long")).alias("y_hi"),
    ).first()
    if b["x_lo"] is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    x = _normalize16(F.col(col_x), int(b["x_lo"]), int(b["x_hi"]))
    y = _normalize16(F.col(col_y), int(b["y_lo"]), int(b["y_hi"]))
    return df.withColumn(out_col, _interleave(x, y))


def repartition_by_zvalue(
    df: DataFrame, col_x: str, col_y: str, n_files: int | None = None
) -> DataFrame:
    """The write-layout step: range-partition on the z-value so each
    output file covers a compact Z-curve segment — predicates on
    either key column then skip most files. Follow with a parquet
    write; statistics (min/max per file) do the pruning."""
    keyed = zorder_keys(df, col_x, col_y)
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, F.col("z_value"))
