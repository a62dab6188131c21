"""Sampling / data-mixing operators for training-data pipelines.

Both are deterministic — no RNG state, no sampling seed to ship — so
runs are reproducible, resumable and cross-engine verifiable:

- deterministic_sample: per-stratum Bernoulli sampling keyed by a hash
  of the row id (md5 16-bit bucket < fraction * 65536). A PURE FILTER:
  no shuffle, pushes through codegen, and membership of a row is
  stable across runs/engines — the property that makes downstream
  joins against the sample reproducible.
- token_budget_per_stratum: per-stratum token budget enforcement ("mix
  N tokens of each language, best documents first") — rank documents
  within each stratum, keep rows while the running token sum fits the
  budget. One shuffle (window per stratum). For mega-strata at 10^12
  docs, pre-aggregate candidates per stratum with a coarse quality
  cutoff first so the per-stratum sort stays bounded (the same
  two-phase trade as skew.two_phase_conv_stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash16(id_col: Column) -> Column:
    """First 16 bits of md5(id) as an int in [0, 65536) — reproducible
    in any engine with md5 + hex arithmetic."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10).cast("int")


def deterministic_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff md5-bucket(id) < fraction(stratum) * 65536.
    Fractions are quantized to 1/65536 granularity."""
    thresh = F.lit(int(default_fraction * 65536))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(stratum_col) == stratum, F.lit(int(frac * 65536))
        ).otherwise(thresh)
    return df.filter(_hash16(F.col(id_col)) < thresh)


def token_budget_per_stratum(
    df: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    tokens_col: Column | str = "n_tokens",
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Keep the best rows of each stratum while the RUNNING token sum
    stays within ``budget`` (a row is kept iff the budget still has
    room for it entirely — greedy by rank order). ``order_by`` defines
    "best" (default: most tokens first, id tie-break)."""
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    order = order_by or [tokens.desc(), F.col("doc_id").asc()]
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("_running_tokens", F.sum(tokens).over(w))
        .filter(F.col("_running_tokens") <= budget)
        .drop("_running_tokens")
    )
