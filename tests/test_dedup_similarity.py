"""Property tests for the hash-seeded operators (no SQL oracle is
possible — cross-engine hash parity doesn't exist), pinning the
guarantees that matter: planted duplicates are FOUND, and the exact
verify stage keeps precision at 1.0."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quanta_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_candidates,
    minhash_near_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from quanta_spark.operators.similarity import brute_force_cosine_topk, lsh_cosine_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs2(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    clones = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return docs.unionByName(clones).select("doc_id", "text").cache()


def test_exact_dedup_finds_planted_clones(spark, docs2):
    groups = exact_dedup_groups(docs2).filter(F.col("n_copies") > 1)
    n_planted = docs2.filter(F.col("doc_id") >= 1_000_000).count()
    assert groups.count() == n_planted
    assert groups.agg(F.max("n_copies")).first()[0] == 2


def test_minhash_finds_all_planted_clones(spark, docs2):
    """An exact duplicate has identical minhash signature in every
    band, so LSH recall on clones is 1.0 by construction."""
    pairs = minhash_near_dup_pairs(docs2, threshold=0.99)
    found = {
        (r["doc_a"], r["doc_b"]) for r in pairs.collect()
    }
    expected = {
        (i, i + 1_000_000)
        for (i,) in docs2.filter(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 1_000_000)
        ).select("doc_id").collect()
    }
    assert expected <= found
    # verify stage precision: every reported pair really has jaccard>=.99
    assert pairs.filter(F.col("jaccard") < 0.99).count() == 0


def test_minhash_candidates_bounded(spark, docs2):
    """LSH shouldn't degenerate to all-pairs on unrelated docs."""
    n_docs = docs2.count()
    sigs = minhash_signatures(docs2)
    cands = minhash_lsh_candidates(sigs).count()
    assert cands < n_docs * (n_docs - 1) / 8, "candidate explosion"


def test_simhash_finds_planted_clones(spark, docs2):
    pairs = simhash_near_dup_pairs(docs2, max_hamming=0)
    found = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    expected = {
        (i, i + 1_000_000)
        for (i,) in docs2.filter(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 1_000_000)
        ).select("doc_id").collect()
    }
    assert expected <= found


def test_ngram_jaccard_identical_docs_is_one(spark, docs2):
    pair = spark.createDataFrame(
        [(0, 1_000_000)], "doc_a long, doc_b long"
    )
    out = ngram_jaccard_pairs(docs2, pair_df=pair).first()
    assert out["jaccard"] == 1.0


@pytest.fixture(scope="module")
def emb2(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    clones = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    return emb.unionByName(clones).cache()


def test_brute_force_top1_is_planted_clone(spark, emb2):
    queries = emb2.filter(
        (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 1_000_000)
    )
    top = brute_force_cosine_topk(emb2, queries, k=1).collect()
    for r in top:
        assert r["vec_id"] == r["query_id"] + 1_000_000, r
        assert r["sim_bp"] == 10_000


def test_lsh_top1_finds_planted_clone(spark, emb2):
    """Identical vectors always share every hyperplane bucket, so the
    clone is guaranteed to be in the probed candidate set."""
    queries = emb2.filter(
        (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 1_000_000)
    )
    top = lsh_cosine_topk(emb2, queries, k=1).collect()
    assert len(top) > 0
    for r in top:
        assert r["vec_id"] == r["query_id"] + 1_000_000, r
        assert r["sim_bp"] == 10_000


def test_lsh_recall_vs_brute_force(spark, emb2):
    queries = emb2.filter(F.col("vec_id") == 0)
    bf = {r["vec_id"] for r in brute_force_cosine_topk(emb2, queries, k=10).collect()}
    ls = {r["vec_id"] for r in lsh_cosine_topk(emb2, queries, k=10, n_bits=4).collect()}
    assert len(bf & ls) / len(bf) >= 0.2, f"LSH recall collapsed: {bf & ls}"
