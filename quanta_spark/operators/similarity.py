"""Similarity search over embedding columns (array<float>).

Two paths, matching how ANN is actually deployed on Spark:

- brute-force top-k (the exactness baseline): broadcast the (small)
  query matrix to every executor, scan the corpus ONCE with a
  vectorized Arrow UDF computing all query dot products per batch in
  numpy (BLAS), then a per-query top-k. Cost: one corpus scan — the
  right plan when |queries| << |corpus|, and the verifier for any
  approximate index.
- LSH-bucketed (the scale path): random-hyperplane signatures bucket
  the corpus; queries probe only their bucket (plus optional
  neighboring probes) — candidate set shrinks by ~2^bits, turning
  all-pairs into a bucket-equi-join, which is the only shape that
  survives 10^12 rows.

Determinism: similarity is computed in float64 and reported in basis
points (round(sim*1e4) as int) with doc-id tie-breaks, so results are
stable across engines and summation orders (the DuckDB oracle computes
the same integers via list_cosine_similarity on DOUBLE[]).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _topk_window(df: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_bp").desc(), F.col("vec_id").asc()
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim_bp")
    )


def brute_force_cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k. ``queries`` must be small (collected to the
    driver and broadcast — the standard pattern; for query STREAMS use
    the LSH path instead). One corpus scan, numpy per Arrow batch."""
    q_rows = queries.select("vec_id", "embedding").collect()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    sc = corpus.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(q_ids), sc.broadcast(q_mat)

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = b_ids.value, b_mat.value
        for pdf in it:
            if not len(pdf):
                continue
            c = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
            sims = c @ qm.T  # (batch, n_queries)
            n, q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qi, n),
                    "vec_id": np.tile(pdf["vec_id"].to_numpy(), q),
                    "sim_bp": np.rint(sims.T.reshape(-1) * 10_000).astype(np.int64),
                }
            )

    scored = corpus.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id long, vec_id long, sim_bp long"
    )
    scored = scored.filter(F.col("query_id") != F.col("vec_id"))
    return _topk_window(scored, k)


def hyperplane_signature(df: DataFrame, n_bits: int = 8, dim: int = 64, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (JVM-free except one
    vectorized UDF pass). Fixed seed => deterministic buckets."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    sc = df.sparkSession.sparkContext
    b_planes = sc.broadcast(planes)

    def sig(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = b_planes.value
        for pdf in it:
            if not len(pdf):
                continue
            v = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            bits = (v @ pl.T) > 0  # (n, n_bits)
            bucket = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)
            out = pdf[["vec_id"]].copy()
            out["bucket"] = bucket.astype(np.int64)
            yield out

    return df.mapInPandas(sig, schema="vec_id long, bucket long").join(
        df, "vec_id"
    )


def lsh_cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, n_bits: int = 8
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket. The
    bucket equi-join replaces the all-pairs cross product — this is
    the 10^12-row shape. Recall < 1 by construction; verified against
    brute force in tests (recall floor asserted)."""
    dim = len(corpus.select("embedding").first()["embedding"])
    c_sig = hyperplane_signature(corpus, n_bits=n_bits, dim=dim).select(
        F.col("vec_id"), F.col("bucket"), F.col("embedding")
    )
    q_sig = hyperplane_signature(queries, n_bits=n_bits, dim=dim).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket"),
        F.col("embedding").alias("q_emb"),
    )
    paired = c_sig.join(F.broadcast(q_sig), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    # exact cosine on the candidates, JVM-side in float64
    dot = F.aggregate(
        F.zip_with("embedding", "q_emb", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    sim = dot / F.greatest(norm(F.col("embedding")) * norm(F.col("q_emb")), F.lit(1e-12))
    scored = paired.select(
        "query_id",
        "vec_id",
        F.round(sim * 10_000).cast("long").alias("sim_bp"),
    )
    return _topk_window(scored, k)
