"""Sampling / data-mixing operator tests: determinism and budget
invariants that matter in a resumable training pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quanta_spark.operators.sampling import (
    deterministic_sample,
    token_budget_per_stratum,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_sample_is_deterministic_and_stable_under_partitioning(spark, docs):
    frac = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25}
    a = {r["doc_id"] for r in deterministic_sample(docs, frac).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(7), frac).collect()
    }
    assert a == b and len(a) > 0  # membership independent of physical layout


def test_sample_rate_within_tolerance(spark, docs):
    n_en = docs.filter("lang = 'en'").count()
    got = deterministic_sample(docs, {"en": 0.5}, default_fraction=0.0).count()
    assert abs(got / n_en - 0.5) < 0.15, (got, n_en)


def test_sample_subset_property(spark, docs):
    """A smaller fraction's sample is a SUBSET of a larger one — the
    hash-threshold construction gives nested samples for free, which
    is what makes growing a training mix reproducible."""
    small = {r["doc_id"] for r in deterministic_sample(docs, {"en": 0.2}).collect()}
    large = {r["doc_id"] for r in deterministic_sample(docs, {"en": 0.6}).collect()}
    assert small <= large


def test_chunking_reconstructs_documents(spark, docs):
    """Dropping each chunk's overlap prefix and concatenating in
    chunk_idx order must reproduce the original token stream exactly —
    no token lost, duplicated, or reordered by the fan-out."""
    from quanta_spark.operators.text import chunk_documents

    import re

    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4).toPandas()
    orig = {r["doc_id"]: re.split(r"\s+", r["text"].strip()) for r in docs.collect()}
    for doc_id, grp in chunks.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        rebuilt: list[str] = []
        for _, row in grp.iterrows():
            toks = row["chunk_text"].split(" ")
            assert len(toks) == row["n_chunk_tokens"]
            rebuilt.extend(toks if row["chunk_idx"] == 0 else toks[4:])
        assert rebuilt == orig[doc_id], doc_id
    assert chunks["n_chunk_tokens"].max() <= 16


def test_token_budget_invariants(spark, docs):
    from quanta_spark.operators.text import ws_token_count

    d = docs.select("doc_id", "lang", ws_token_count(F.col("text")).alias("n_tokens"))
    out = token_budget_per_stratum(d, budget=500, tokens_col="n_tokens").toPandas()
    sums = out.groupby("lang")["n_tokens"].sum()
    assert (sums <= 500).all(), sums
    # greedy by size: every kept doc is at least as big as any excluded
    # doc of the same stratum that would still have fit the leftover
    kept_min = out.groupby("lang")["n_tokens"].min()
    full = d.toPandas()
    for lang, row_min in kept_min.items():
        excluded = full[(full["lang"] == lang) & (~full["doc_id"].isin(out["doc_id"]))]
        if len(excluded):
            assert excluded["n_tokens"].max() <= row_min or (
                sums[lang] + excluded["n_tokens"].min() > 500
            )
