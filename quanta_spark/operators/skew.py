"""Skew handling for mega-conversations.

The reference has no skew story — distribution is whatever Kafka's
partitioner does with the frame key (frame.proto:36). At 10^12 turns a
single mega-conversation holding ~10% of all turns (FIXTURES.md §1)
concentrates that 10% in ONE task for any conv_id-keyed shuffle. The
target spec calls for salted conv_id repartitioning + AQE skew-join
splitting (BASELINE.json north_star).

What actually needs salting, and what doesn't:

- plain ``groupBy(conv_id).agg(...)`` with algebraic aggregates does
  NOT need it — Spark's hash aggregate computes map-side partials, so
  the hot key arrives at the reducer pre-collapsed (one row per input
  partition). Measured, not guessed: see tests/test_skew.py.
- per-group *holistic* work (applyInPandas, window-function sorts,
  top-k with full sort) DOES hot-spot: the whole group must co-locate.
  Fix: two-phase over a salt — partial per (key, salt), merge partials.
- joins on conv_id hot-spot the build/probe side: AQE skew-join
  (enabled in session.py) splits oversized partitions at runtime; for
  stream-stream joins (where AQE doesn't apply) the reply-join keys on
  (conv_id, turn_idx) ranges which spread a mega-conv across buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_SALT = 16


def salt_col(n_buckets: int = DEFAULT_SALT, by: str = "turn_idx") -> Column:
    """Deterministic salt derived from a high-cardinality column —
    spreads one hot conv_id over ``n_buckets`` shuffle partitions."""
    return F.pmod(F.hash(F.col(by)), F.lit(n_buckets)).alias("_salt")


def repartition_salted(
    df: DataFrame,
    key: str = "conv_id",
    n_buckets: int = DEFAULT_SALT,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (key, salt) instead of key — the explicit salted
    repartition from the spec. Use before per-group holistic work that
    can tolerate partial groups. An explicit partition count pins the
    exchange (AQE would otherwise coalesce a small benchmark input and
    mask the skew behavior under test)."""
    n = num_partitions or n_buckets
    return df.repartition(n, F.col(key), salt_col(n_buckets))


def two_phase_conv_stats(
    df: DataFrame, n_buckets: int = DEFAULT_SALT
) -> DataFrame:
    """Per-conversation stats via explicit two-phase aggregation:
    partial per (conv_id, salt), final merge per conv_id. Equivalent
    to the direct groupBy (tested) but never materializes a whole
    mega-conversation in one task even for holistic extensions."""
    partial = df.groupBy(F.col("conv_id"), salt_col(n_buckets)).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.length("text")).alias("_chars"),
        F.max("turn_idx").alias("_max_idx"),
        F.min("ts").alias("_min_ts"),
        F.max("ts").alias("_max_ts"),
    )
    return partial.groupBy("conv_id").agg(
        F.sum("_n").alias("n_turns"),
        F.sum("_chars").alias("n_chars"),
        F.max("_max_idx").alias("last_turn"),
        F.min("_min_ts").alias("first_ts"),
        F.max("_max_ts").alias("last_ts"),
    )


def top_k_turns_per_conv(
    df: DataFrame, k: int = 3, n_buckets: int = DEFAULT_SALT
) -> DataFrame:
    """Top-k longest turns per conversation, skew-safely: partial top-k
    within each (conv_id, salt) bucket, then final top-k over the
    k*n_buckets survivors — the mega-conversation never sorts in one
    task. Output is deterministic: ties broken by turn_idx."""
    by_len = [F.length("text").desc(), F.col("turn_idx").asc()]
    w_partial = Window.partitionBy("conv_id", "_salt").orderBy(*by_len)
    w_final = Window.partitionBy("conv_id").orderBy(*by_len)
    survivors = (
        df.withColumn("_salt", salt_col(n_buckets))
        .withColumn("_rn", F.row_number().over(w_partial))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select(
            "conv_id",
            "rank",
            "turn_idx",
            F.length("text").alias("text_len"),
            "role",
        )
    )


def skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Key-skew diagnostics — the report you run BEFORE choosing a
    partitioning strategy (salt? AQE skew join? broadcast?): exact
    per-key-count percentiles, the heaviest key's share, and a
    max/median skew factor. Two aggregations: per-key counts (map-side
    combined), then a one-row rollup over the counts table — the
    corpus never sorts globally. All values integer/bp-floored so a
    SQL oracle hash-matches."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    c = F.col("n").cast("double")
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_key_rows"),
        F.floor(F.percentile(c, F.lit(0.5)) * 10_000 + F.lit(0.5))
        .cast("long")
        .alias("p50_bp"),
        F.floor(F.percentile(c, F.lit(0.99)) * 10_000 + F.lit(0.5))
        .cast("long")
        .alias("p99_bp"),
        F.floor(F.max("n") * 10_000 / F.sum("n") + F.lit(0.5))
        .cast("long")
        .alias("top1_share_bp"),
        F.floor(
            F.max("n") * 10_000 / F.greatest(F.percentile(c, F.lit(0.5)), F.lit(1.0))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("skew_factor_bp"),
    )
