"""Bucketed-table layout: co-located joins and aggregations with NO
shuffle at read time.

At 10^12 turns the dominant cost of every conv_id join/aggregate is
the exchange. Hash-bucketing the stored table by ``conv_id`` (the
Spark/Hive bucketing layout Iceberg expresses as `bucket(N, conv_id)`
partition transforms — SURVEY.md §4.2) moves that shuffle to WRITE
time, once, and every subsequent join between two tables bucketed on
the same key with the same bucket count — and every groupBy on the
bucket key — runs exchange-free: the scan itself reports hash
distribution, so SortMergeJoin's distribution requirement is already
satisfied. Tests assert the plan property (zero Exchange nodes).

Bucket count is a layout contract: pick it for the TARGET scale (e.g.
4096 buckets at 10^12 turns keeps one bucket ~ a few GB) — both sides
of a co-located join must agree on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 32,
    key: str = "conv_id",
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``key`` (and sorted within each
    bucket by ``sort_cols``, default the key — pre-sorting also lets
    SortMergeJoin skip its sort). Bucketing metadata lives in the
    session catalog; use the same ``n_buckets`` for every table that
    must co-join."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(*(sort_cols or [key]))
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cocluster_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — plans with
    zero Exchange nodes when both were written by write_bucketed with
    the same key and bucket count."""
    return spark.table(left_table).join(spark.table(right_table), on)
