"""Mergeable sketches — the incremental-statistics machinery of a
100 TB pipeline.

``approx_count_distinct`` answers one query; what a large pipeline
actually needs is a PER-SHARD sketch it can store, union with
yesterday's, and estimate from without rescanning the corpus. Spark's
Apache DataSketches HLL functions (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate, built-in since 3.5) provide exactly that: sketch
each shard/partition/day once, merge the binary sketches associatively,
estimate at read time. The q52 gate pins the property that makes this
trustworthy: union(per-shard sketches) estimates within a tight bound
of sketch(whole corpus) — NOT bit-equality: DataSketches unions may
resolve sparse-vs-dense modes differently per split (measured 500 vs
501 vs 503 on the same 506-distinct corpus across 2/7/1000-way shards)
— and both land within the HLL error bound of the exact count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_sketches(
    df: DataFrame,
    group_col: str,
    value: Column | str,
    shard: Column | str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per (group, shard): the store-and-merge-later
    unit. lgConfigK=12 => ~1.6 KB per sketch, ~2.5% relative error."""
    value = F.col(value) if isinstance(value, str) else value
    shard = F.col(shard) if isinstance(shard, str) else shard
    return (
        df.select(F.col(group_col), value.alias("_v"), shard.alias("_shard"))
        .groupBy(group_col, "_shard")
        .agg(F.hll_sketch_agg("_v", F.lit(lg_k)).alias("sketch"))
    )


def merged_distinct_estimate(
    sketches: DataFrame, group_col: str
) -> DataFrame:
    """Union each group's shard sketches -> (group, estimate). This is
    the read-time step: no raw data touched, just sketch bytes."""
    return (
        sketches.groupBy(group_col)
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            group_col, F.hll_sketch_estimate("merged").alias("distinct_estimate")
        )
    )


def mergeable_distinct_check(
    df: DataFrame,
    group_col: str,
    value: Column | str,
    shard: Column | str,
    rel_error: float = 0.05,
    lg_k: int = 12,
) -> DataFrame:
    """Gate shape: per group, the exact distinct count plus two
    booleans — (a) the shard-merged estimate is within ``rel_error``
    of the whole-corpus single-sketch estimate (merge soundness; exact
    equality does NOT hold, see module docstring), and (b) the merged
    estimate is within ``rel_error`` of exact. Exact values + boolean
    bounds keep the output portable to a SQL oracle (q42 trick)."""
    value = F.col(value) if isinstance(value, str) else value
    merged = merged_distinct_estimate(
        shard_sketches(df, group_col, value, shard, lg_k=lg_k), group_col
    )
    whole = (
        df.select(F.col(group_col), value.alias("_v"))
        .groupBy(group_col)
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("_v", F.lit(lg_k))).alias(
                "whole_estimate"
            ),
            F.count_distinct(F.col("_v")).alias("exact_distinct"),
        )
    )
    return (
        whole.join(merged, group_col)
        .select(
            group_col,
            "exact_distinct",
            (
                F.abs(F.col("distinct_estimate") - F.col("whole_estimate"))
                <= F.greatest(F.col("whole_estimate") * rel_error, F.lit(1.0))
            ).alias("merge_matches_whole"),
            (
                F.abs(F.col("distinct_estimate") - F.col("exact_distinct"))
                <= F.col("exact_distinct") * rel_error
            ).alias("merged_within_bound"),
        )
    )
