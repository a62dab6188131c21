"""Deduplication operators for training-data pipelines.

Four tiers, each a real distributed plan (no driver-side loops):

- exact:        md5-of-normalized-text groupBy — one shuffle on the
                fingerprint, trivially scales.
- ngram-Jaccard: exact 3-gram set similarity for candidate pairs —
                built-in array functions only (JVM-side).
- MinHash+LSH:  shingle -> 64 minhashes -> band buckets -> bucket
                self-join for candidates -> exact-Jaccard verify.
                The self-join is on (band, bucket-hash): a shuffle
                whose key cardinality grows with corpus size, which is
                what makes it work at 10^12 docs where all-pairs can't.
- SimHash:      64-bit weighted-token hash; near-dups = small Hamming
                distance; bucketing on 4 x 16-bit chunks gives the
                LSH-style candidate generation.

MinHash/SimHash use Spark's xxhash64 for speed (JVM-side); they are
verified by property tests (tests/test_dedup.py) rather than a DuckDB
oracle — cross-engine hash parity is impossible and the exact-Jaccard
verify step is the part that defines output correctness anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 as the universal-hash modulus: with 31-bit
# shingle hashes and 30-bit coefficients, a*x + b < 2^62 stays inside
# a signed 64-bit long (Spark 4 runs ANSI mode — overflow would raise,
# and silently wrapping would break min-hash uniformity anyway).
_P = (1 << 31) - 1


def normalized(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content fingerprint: one row per distinct
    content with the kept doc (lowest doc_id) and duplicate count."""
    return (
        df.select("doc_id", F.md5(normalized(F.col(text_col))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _grams_of_norm(norm: Column, n: int) -> Column:
    """Distinct character n-grams of an ALREADY-MATERIALIZED normalized
    column (empty array for too-short texts — sequence() would reverse
    on start>stop). The caller must ensure ``norm`` is a plain column
    reference, not an expression: the transform() lambda evaluates its
    captured expressions once PER ELEMENT, so an inline regexp_replace
    here costs O(len^2) regex work per document (measured 25x slower
    at sf0.1 — see _norm_grams_df)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
        lambda i: norm.substr(i, F.lit(n)),
    )
    return F.when(F.length(norm) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _norm_grams_df(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, grams) with the normalization materialized behind an
    exchange barrier: Catalyst's CollapseProject would otherwise inline
    the regexp_replace into the per-element lambda. The repartition
    also restores parallelism for the downstream explode/join — the
    plan shape you want at corpus scale anyway."""
    # explicit partition count: AQE would coalesce this tiny-bytes
    # exchange to 1 partition, serializing the (CPU-heavy) downstream
    # gram transform + explode onto one core (measured 4-16x slowdown)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    normed = df.select(
        "doc_id", normalized(F.col(text_col)).alias("_nrm")
    ).repartition(n_parts, F.col("doc_id"))
    return normed.select(
        "doc_id", _grams_of_norm(F.col("_nrm"), n).alias("grams")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pair_df: DataFrame | None = None,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs.

    ``pair_df(doc_a, doc_b)`` supplies candidates (from LSH or any
    blocking); default blocks on consecutive doc_ids (cheap demo
    blocking). Jaccard is computed with array_intersect/union —
    whole-stage-codegen'd, no Python.
    """
    grams = _norm_grams_df(df, text_col, n)
    if pair_df is None:
        pair_df = df.select((F.col("doc_id")).alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b"))
    a = grams.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("g_a"))
    b = grams.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("g_b"))
    joined = pair_df.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    return joined.select(
        "doc_a",
        "doc_b",
        inter.alias("n_common"),
        union.alias("n_union"),
        F.round(inter / F.greatest(union, F.lit(1)), 4).alias("jaccard"),
    )


def minhash_signatures(
    df: DataFrame, n_hashes: int = 64, shingle_n: int = 5, text_col: str = "text"
) -> DataFrame:
    """64 minhash values per doc over 5-gram shingles.

    Plan shape: explode shingles (shingle->31-bit hash JVM-side) ->
    numpy partial minhash per Arrow batch (one (a*x+b) mod p matrix op
    — measured ~10x faster than 64 JVM min-aggregates, which fall out
    of whole-stage codegen at this expression count) -> final
    groupBy(doc_id).min over the tiny per-partition partials.
    Universal-hash coefficients come from a fixed seed => deterministic.
    """
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(20250816)
    a = rng.integers(1, (1 << 30) - 1, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _P, size=n_hashes, dtype=np.int64)
    cols = [f"mh_{i}" for i in range(n_hashes)]

    shingles = _norm_grams_df(df, text_col, shingle_n).select(
        "doc_id", F.explode("grams").alias("sh")
    ).select("doc_id", F.xxhash64("sh").bitwiseAND(F.lit(_P)).alias("x"))

    def partial(it):
        for pdf in it:
            if not len(pdf):
                continue
            # sort by doc, then one matrix pass: (n, k) = (a*x+b) % p
            pdf = pdf.sort_values("doc_id", kind="mergesort")
            x = pdf["x"].to_numpy(dtype=np.int64)
            h = (x[:, None] * a[None, :] + b[None, :]) % _P  # a<2^30,x<2^31: no overflow
            ids, starts = np.unique(pdf["doc_id"].to_numpy(), return_index=True)
            mins = np.minimum.reduceat(h, starts, axis=0)
            out = pd.DataFrame(mins, columns=cols)
            out.insert(0, "doc_id", ids)
            yield out

    schema = "doc_id long, " + ", ".join(f"{c} long" for c in cols)
    partials = shingles.mapInPandas(partial, schema=schema)
    return partials.groupBy("doc_id").agg(
        *[F.min(c).alias(c) for c in cols]
    )


def minhash_lsh_candidates(
    sigs: DataFrame, n_bands: int = 8, rows_per_band: int = 8
) -> DataFrame:
    """Band the signature, bucket-join within each band: docs sharing
    any full band are candidate near-dups. Output distinct
    (doc_a < doc_b) pairs. The shuffle key is (band, bucket), so skew
    is bounded by actual near-dup cluster sizes.

    Band geometry matters: the LSH s-curve threshold is (1/b)^(1/r).
    8 bands x 8 rows => ~0.77, matched to the 0.8 near-dup threshold;
    16x4 (~0.5) was measured to explode candidates 10x on a corpus
    with high baseline similarity, and the verify join cost is linear
    in candidates."""
    n_hashes = n_bands * rows_per_band
    bands = sigs.select(
        "doc_id",
        *[
            F.xxhash64(
                F.lit(b), *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias(f"band_{b}")
            for b in range(n_bands)
        ],
    )
    stacked = bands.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket"))
                for b in range(n_bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    left = stacked.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    right = stacked.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    shingle_n: int = 5,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: candidates from LSH, then
    EXACT n-gram Jaccard verification >= threshold. The verify step
    makes the output exact-on-candidates (LSH only affects recall)."""
    sigs = minhash_signatures(df, shingle_n=shingle_n, text_col=text_col)
    cands = minhash_lsh_candidates(sigs)
    verified = ngram_jaccard_pairs(df, pair_df=cands, n=shingle_n, text_col=text_col)
    return verified.filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-bit majority vote of
    token hashes. Vectorized as: explode tokens -> for each bit, sum
    (+1/-1) -> sign -> reassemble. One shuffle (groupBy doc_id)."""
    toks = df.select(
        "doc_id",
        F.explode(F.split(normalized(F.col(text_col)), " ")).alias("tok"),
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"bit_{i}")
            for i in range(64)
        ]
    )
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"bit_{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    return bit_sums.select("doc_id", sim.alias("simhash"))


def simhash_near_dup_pairs(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup candidates: block on 4 x 16-bit chunks (any
    pair within Hamming distance 3 shares at least one chunk — pigeon-
    hole), verify Hamming distance JVM-side via bit_count(xor)."""
    sh = simhash(df)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_id"),
                    F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                )
                for c in range(4)
            ])
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk_id", "cc.chunk")
    left = chunks.select("chunk_id", "chunk", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    right = chunks.select("chunk_id", "chunk", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    pairs = (
        left.join(right, ["chunk_id", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
