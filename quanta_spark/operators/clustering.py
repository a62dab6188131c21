"""Distributed k-means training (Lloyd's algorithm), oracle-exact.

The IVF family (similarity.py:420-546) uses deterministic md5-least
vectors as a STAND-IN for trained coarse centroids; this module trains
real ones, in the canonical Spark iterative shape: broadcast the k x d
centroid matrix, one Arrow pass computes per-partition partial sums
(k x d matrix + k counts per partition — never a row per point), a
(cell, dim) hash aggregate reduces them, and the driver materializes
only the k x d update (bounded, independent of corpus size). Each
Lloyd iteration is one job; lineage does not grow because each
iteration re-reads the same quantized input.

Everything is INTEGER-exact so a SQL oracle can replay training
bit-for-bit with zero float-boundary flake risk:
- vectors quantize to integers once up front (round(x * scale));
- distances are integer squared-euclidean (exact in int64);
- argmin ties break to the lowest cell index;
- centroid updates are FLOORED integer means (floor(sum/count) is
  exact in double because a rational with denominator <= n is at
  least 1/n from the nearest integer — far beyond double error);
- empty cells carry their previous centroid forward.
Quantized Lloyd converges the same way at any realistic scale
(embedding values ~1e0, scale 1000 => per-dim error < 1e-3).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmeans_train_quantized",
    "train_spherical_centroids",
    "random_project",
    "train_pq_codebooks",
    "class_centroid_accuracy",
    "pca_covariance",
    "pca_cov_merge",
    "pca_fit",
    "pca_project",
]

#: Hard ceiling on k*d driver materialization per iteration.
MAX_CENTROID_CELLS = 1_000_000


def kmeans_train_quantized(
    corpus: DataFrame,
    k: int = 6,
    n_iter: int = 2,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train k-means on ``corpus`` (``id_col``, ``vec_col: array<float>``)
    for ``n_iter`` assign+update rounds from deterministic seeds (the k
    md5-least ids, the same seeding rule as similarity._ivf_centroids).

    Returns k*d rows: (cell, dim, c_val, n_members, sum_d2) — the final
    centroid matrix plus, per cell, the LAST assignment's membership
    count and exact integer inertia (sum of squared distances), the
    quality number you watch across iterations.
    """
    if k < 1 or n_iter < 1:
        raise ValueError(f"need k >= 1 and n_iter >= 1, got k={k} n_iter={n_iter}")
    spark = corpus.sparkSession
    q = corpus.select(
        F.col(id_col).alias("_id"),
        F.transform(
            # cast float32 -> double BEFORE scaling (exact), so the
            # quantization arithmetic is identical to a double-based
            # SQL oracle at every rounding boundary
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
        ).alias("_qv"),
    )
    seeds = (
        q.withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"corpus has only {len(seeds)} vectors for k={k}")
    cent = np.array([r["_qv"] for r in seeds], dtype=np.int64)
    d = cent.shape[1]
    if k * d > MAX_CENTROID_CELLS:
        raise ValueError(f"k*d = {k * d} exceeds MAX_CENTROID_CELLS")

    def partials_of(cmat: np.ndarray):
        def fn(batches):
            import pandas as pd

            kk, dd = cmat.shape
            sums = np.zeros((kk, dd), dtype=np.int64)
            counts = np.zeros(kk, dtype=np.int64)
            d2sum = np.zeros(kk, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf["_qv"].to_numpy()).astype(np.int64)
                # exact int64 squared euclidean; argmin -> lowest cell
                diff = x[:, None, :] - cmat[None, :, :]
                dist = np.einsum("nkd,nkd->nk", diff, diff)
                cell = dist.argmin(axis=1)
                np.add.at(sums, cell, x)
                np.add.at(counts, cell, 1)
                np.add.at(d2sum, cell, dist[np.arange(len(x)), cell])
            out = {
                "cell": np.repeat(np.arange(kk, dtype=np.int32), dd),
                "dim": np.tile(np.arange(dd, dtype=np.int32), kk),
                "s": sums.reshape(-1),
                "n": np.repeat(counts, dd),
                "d2": np.repeat(d2sum, dd),
            }
            yield pd.DataFrame(out)

        return fn

    counts = np.zeros(k, dtype=np.int64)
    d2sum = np.zeros(k, dtype=np.int64)
    for _ in range(n_iter):
        agg = (
            q.mapInPandas(
                partials_of(cent), schema="cell int, dim int, s long, n long, d2 long"
            )
            .groupBy("cell", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"), F.sum("d2").alias("d2"))
            .collect()  # bounded: k*d rows (<= MAX_CENTROID_CELLS)
        )
        sums = np.zeros((k, d), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        d2sum = np.zeros(k, dtype=np.int64)
        for r in agg:
            sums[r["cell"], r["dim"]] = r["s"]
            counts[r["cell"]] = r["n"]
            d2sum[r["cell"]] = r["d2"]
        nonempty = counts > 0
        new_cent = cent.copy()  # empty cells carry forward
        new_cent[nonempty] = np.floor_divide(
            sums[nonempty], counts[nonempty, None]
        )
        cent = new_cent

    rows = [
        (
            int(c),
            int(j),
            int(cent[c, j]),
            int(counts[c]),
            int(d2sum[c]),
        )
        for c in range(k)
        for j in range(d)
    ]
    return spark.createDataFrame(
        rows, "cell int, dim int, c_val long, n_members long, sum_d2 long"
    )


def train_spherical_centroids(
    corpus: DataFrame,
    n_cells: int,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means for IVF coarse quantizers: Lloyd iterations
    on UNIT vectors with cosine (argmax dot) assignment and
    normalized-mean updates — the training loop behind a production
    IVF index (Faiss's default coarse quantizer), replacing the
    md5-least seed stand-in when recall matters more than cross-engine
    oracle exactness (this path is float and bench-graded, like the
    xxhash64 minhash family; the oracle gates pin the seed path).

    Same scale shape as kmeans_train_quantized: broadcast centroids,
    one Arrow pass per iteration emitting per-partition partial sums,
    a (cell, dim) reduce, and an O(n_cells x d) driver update. Empty
    cells carry forward. Returns the normalized (n_cells, d) float64
    matrix, rows usable wherever _ivf_centroids' matrix is."""
    if n_cells < 1 or n_iter < 1:
        raise ValueError(
            f"need n_cells >= 1 and n_iter >= 1, got {n_cells}, {n_iter}"
        )
    seeds = (
        corpus.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
        )
        .withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy(F.col("_h").asc(), F.col("_id").asc())
        .limit(n_cells)
        .collect()
    )
    if len(seeds) < n_cells:
        raise ValueError(f"corpus has only {len(seeds)} vectors for {n_cells} cells")
    cent = np.array([r["_v"] for r in seeds], dtype=np.float64)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    d = cent.shape[1]
    vecs = corpus.select(F.col(vec_col).alias("_v"))

    def partials_of(cmat: np.ndarray):
        def fn(batches):
            import pandas as pd

            kk, dd = cmat.shape
            sums = np.zeros((kk, dd), dtype=np.float64)
            counts = np.zeros(kk, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
                cell = (x @ cmat.T).argmax(axis=1)  # first max = lowest cell
                np.add.at(sums, cell, x)
                np.add.at(counts, cell, 1)
            yield pd.DataFrame(
                {
                    "cell": np.repeat(np.arange(kk, dtype=np.int32), dd),
                    "dim": np.tile(np.arange(dd, dtype=np.int32), kk),
                    "s": sums.reshape(-1),
                    "n": np.repeat(counts, dd),
                }
            )

        return fn

    for _ in range(n_iter):
        agg = (
            vecs.mapInPandas(
                partials_of(cent), schema="cell int, dim int, s double, n long"
            )
            .groupBy("cell", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()  # bounded: n_cells * d rows
        )
        sums = np.zeros((n_cells, d), dtype=np.float64)
        counts = np.zeros(n_cells, dtype=np.int64)
        for r in agg:
            sums[r["cell"], r["dim"]] = r["s"]
            counts[r["cell"]] = r["n"]
        new_cent = cent.copy()
        nonempty = counts > 0
        norms = np.linalg.norm(sums[nonempty], axis=1, keepdims=True)
        new_cent[nonempty] = sums[nonempty] / np.maximum(norms, 1e-12)
        cent = new_cent
    return cent


def _rp_sign(i: int, j: int) -> int:
    """Engine-portable ±1: parity of the first hex nibble of
    md5("i-j") (0-based dims). Reproducible in SQL as
    (strpos('0123456789abcdef', substr(md5(...), 1, 1)) - 1) % 2."""
    import hashlib

    return 1 if int(hashlib.md5(f"{i}-{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


def random_project(
    df: DataFrame,
    in_dim: int = 64,
    out_dim: int = 16,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sparse sign random projection (Achlioptas 2003): y_j = sum_i
    s_ij * x_i with s_ij in {+1, -1} — the Johnson-Lindenstrauss
    dimensionality reduction used to shrink embeddings before ANN
    blocking or as cheap LSH-adjacent features. The sign matrix is
    derived from md5 (data-independent, seed-free, engine-portable:
    an oracle re-derives it in SQL), NOT sampled — no RNG state to
    ship, no drift between runs. Inputs quantize to integers
    (round(x*scale)) so every projection sum is EXACT in int64.

    Pure Catalyst: per output dim, one zip_with(vector, literal sign
    array) + aggregate fold — whole-stage codegen, zero Python, zero
    shuffle (the consumer's groupBy/join pays the first exchange).
    Output long format (id, out_dim, y) for direct feeding into
    banding/blocking joins. Standard JL rescaling (1/sqrt(out_dim))
    is left to the consumer — integer output keeps oracles exact."""
    if out_dim < 1 or in_dim < 1:
        raise ValueError(f"need in_dim/out_dim >= 1, got {in_dim}/{out_dim}")
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
    )
    base = df.select(F.col(id_col), qv.alias("_qv"))
    cols = []
    for j in range(out_dim):
        signs = F.array(
            *[F.lit(_rp_sign(i, j)).cast("long") for i in range(in_dim)]
        )
        y = F.aggregate(
            F.zip_with(F.col("_qv"), signs, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        cols.append(y.alias(f"_y{j}"))
    wide = base.select(F.col(id_col), *cols)
    stack_args = ", ".join(f"{j}, `_y{j}`" for j in range(out_dim))
    return wide.select(
        F.col(id_col),
        F.expr(f"stack({out_dim}, {stack_args}) AS (out_dim, y)"),
    ).select(id_col, F.col("out_dim").cast("int").alias("out_dim"), "y")


def train_pq_codebooks(
    corpus: DataFrame,
    n_cent: int = 16,
    n_sub: int = 8,
    dim: int = 64,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace k-means PQ codebook training (Jegou et al. 2011's
    actual recipe, replacing similarity._pq_centroids' md5-least
    stand-in when recall matters): all ``n_sub`` subspaces train
    SIMULTANEOUSLY — one Arrow pass per Lloyd iteration assigns every
    subvector to its nearest codebook entry and emits per-partition
    partial sums keyed (sub, cent, dim); the reduce + driver update is
    O(n_sub x n_cent x sub_dim), corpus-size-independent. Empty
    entries carry forward. Float quality path (bench-graded; the
    oracle gates pin the seed codebooks). Returns the
    (n_sub, n_cent, sub_dim) float64 tensor ``pq_encode`` consumes."""
    if dim % n_sub:
        raise ValueError(f"dim={dim} not divisible by n_sub={n_sub}")
    if n_cent < 1 or n_iter < 1:
        raise ValueError(f"need n_cent >= 1 and n_iter >= 1, got {n_cent}, {n_iter}")
    sub_dim = dim // n_sub
    rows = (
        corpus.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
        )
        .withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy(F.col("_h").asc(), F.col("_id").asc())
        .limit(n_cent)
        .collect()
    )
    if len(rows) < n_cent:
        raise ValueError(f"corpus has only {len(rows)} vectors for n_cent={n_cent}")
    cent = (
        np.array([r["_v"] for r in rows], dtype=np.float64)
        .reshape(n_cent, n_sub, sub_dim)
        .transpose(1, 0, 2)
        .copy()
    )
    vecs = corpus.select(F.col(vec_col).alias("_v"))

    def partials_of(ct: np.ndarray):
        def fn(batches):
            import pandas as pd

            ns, nc, sd = ct.shape
            sums = np.zeros((ns, nc, sd), dtype=np.float64)
            counts = np.zeros((ns, nc), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                vs = v.reshape(len(v), ns, 1, sd)
                d = ((vs - ct[None]) ** 2).sum(axis=3)  # (n, ns, nc)
                code = d.argmin(axis=2)  # (n, ns), first-min = lowest idx
                for s in range(ns):
                    np.add.at(sums[s], code[:, s], v.reshape(len(v), ns, sd)[:, s])
                    np.add.at(counts[s], code[:, s], 1)
            yield pd.DataFrame(
                {
                    "sub": np.repeat(np.arange(ns, dtype=np.int32), nc * sd),
                    "cent": np.tile(np.repeat(np.arange(nc, dtype=np.int32), sd), ns),
                    "dim": np.tile(np.arange(sd, dtype=np.int32), ns * nc),
                    "s": sums.reshape(-1),
                    "n": np.repeat(counts.reshape(-1), sd),
                }
            )

        return fn

    for _ in range(n_iter):
        agg = (
            vecs.mapInPandas(
                partials_of(cent), schema="sub int, cent int, dim int, s double, n long"
            )
            .groupBy("sub", "cent", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()  # bounded: n_sub * n_cent * sub_dim rows
        )
        sums = np.zeros_like(cent)
        counts = np.zeros((n_sub, n_cent), dtype=np.int64)
        for r in agg:
            sums[r["sub"], r["cent"], r["dim"]] = r["s"]
            counts[r["sub"], r["cent"]] = r["n"]
        nonempty = counts > 0
        new_cent = cent.copy()
        new_cent[nonempty] = sums[nonempty] / counts[nonempty][:, None]
        cent = new_cent
    return cent


def class_centroid_accuracy(
    corpus: DataFrame,
    label_col: str = "label",
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-class-centroid evaluation — the standard cheap probe of
    embedding quality over a labeled table: per-label centroids, then
    every vector classified to its nearest centroid; reports per-label
    (n_vecs, n_correct, accuracy_bp). Integer-exact end to end
    (quantized vectors, floored integer-mean centroids, int64
    distances, lowest-label ties) so a SQL oracle replays it.

    Scale: centroids come from a posexplode + (label, dim) hash
    aggregate — the explode collapses map-side to |labels| x d partials
    per partition (the q55 pooled-embeddings shape). Assignment is
    SHUFFLE-FREE: the |labels| centroid arrays are a bounded driver
    collect folded into one literal-array argmin expression evaluated
    inside the scan (no join, no window over the corpus). The final
    accuracy aggregate shuffles |labels| partial rows per partition."""
    q = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("long").alias("_lbl"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
        ).alias("_qv"),
    )
    sums = (
        q.select("_lbl", F.posexplode("_qv").alias("_dim", "_x"))
        .groupBy("_lbl", "_dim")
        .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
    )
    cent_rows = (
        sums.groupBy("_lbl")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_dim"), F.col("_s"), F.col("_n")))
                ),
                lambda t: F.floor(t["_s"].cast("double") / t["_n"]).cast("long"),
            ).alias("_c")
        )
        .collect()  # bounded: one row per label
    )
    if not cent_rows:
        raise ValueError("class_centroid_accuracy needs a non-empty corpus")
    cent_rows.sort(key=lambda r: r["_lbl"])
    # one literal array of (label, centroid) structs, folded in-scan:
    # assignment never joins or shuffles
    cands = F.array(
        *[
            F.struct(
                F.lit(int(r["_lbl"])).alias("lbl"),
                F.array(*[F.lit(int(v)) for v in r["_c"]]).alias("c"),
            )
            for r in cent_rows
        ]
    )
    d2_of = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(F.col("_qv"), c, lambda x, cc: (x - cc) * (x - cc)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    best = F.aggregate(
        cands,
        F.struct(
            F.lit(None).cast("long").alias("d2"), F.lit(None).cast("long").alias("lbl")
        ),
        lambda acc, cand: F.when(
            acc["d2"].isNull() | (d2_of(cand["c"]) < acc["d2"]),
            F.struct(d2_of(cand["c"]).alias("d2"), cand["lbl"].alias("lbl")),
        ).otherwise(acc),
    )
    scored = q.select(
        "_lbl", (best["lbl"] == F.col("_lbl")).cast("long").alias("_ok")
    )
    return scored.groupBy(F.col("_lbl").alias(label_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("_ok").cast("long").alias("n_correct"),
        F.floor(F.sum("_ok") * 10_000 / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("accuracy_bp"),
    )


def pca_covariance(
    df: DataFrame,
    in_dim: int = 64,
    scale: int = 10_000,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact integer covariance statistics for distributed PCA: one
    Arrow pass emits per-partition partials (d x d second-moment int64
    matrix + per-dim sums + count — never a row per point), a bounded
    (i, j) aggregate reduces them, and the output carries the
    covariance NUMERATOR ``cov_num = n*S_ij - m_i*m_j`` — all integer
    arithmetic on quantized inputs (floor(x*scale + 0.5)), so any
    partitioning / any engine computes the identical d x d table
    (integer sums are order-independent; float covariance would drift
    per shuffle order).

    Scale: the shuffle carries O(partitions) rows of d^2-long arrays,
    never data rows; the result is d^2 rows regardless of corpus size.
    Overflow bound: |x_q| <= scale * max|x|, so S_ij sums stay inside
    int64 up to ~2^63 / (scale*max|x|)^2 rows — at scale=1e4 and unit
    vectors that is ~9e10 rows per partition-partial; raise per-task
    row counts past that and quantize coarser.
    """
    if not 1 <= in_dim <= 256:
        raise ValueError(f"in_dim must be in [1, 256], got {in_dim}")
    d = in_dim
    import pandas as pd

    def partials(batches):
        S = np.zeros((d, d), dtype=np.int64)
        m = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy())
            Q = np.floor(X.astype(np.float64) * scale + 0.5).astype(np.int64)
            S += Q.T @ Q
            m += Q.sum(axis=0)
            n += len(Q)
        if n:
            yield pd.DataFrame({"n": [n], "s": [S.ravel()], "m": [m]})

    parts = df.select(vec_col).mapInPandas(
        partials, schema="n long, s array<long>, m array<long>"
    )
    tot = parts.agg(F.sum("n").alias("n"))
    means = (
        parts.select(F.posexplode("m").alias("i", "mv"))
        .groupBy("i")
        .agg(F.sum("mv").alias("mv"))
    )
    second = (
        parts.select(F.posexplode("s").alias("idx", "sv"))
        .groupBy("idx")
        .agg(F.sum("sv").alias("sv"))
        .select(
            (F.col("idx") / d).cast("long").alias("i"),
            F.pmod(F.col("idx"), F.lit(d)).cast("long").alias("j"),
            F.col("sv").alias("s"),
        )
    )
    mi = means.select(F.col("i"), F.col("mv").alias("mi"))
    mj = means.select(F.col("i").alias("j"), F.col("mv").alias("mj"))
    return (
        second.join(mi, "i")
        .join(mj, "j")
        .crossJoin(tot)
        .select(
            F.col("i").cast("long"),
            F.col("j").cast("long"),
            F.col("n").cast("long"),
            F.col("s").cast("long"),
            F.col("mi").cast("long"),
            F.col("mj").cast("long"),
            (F.col("n") * F.col("s") - F.col("mi") * F.col("mj")).alias("cov_num"),
        )
    )


def pca_fit(
    df: DataFrame,
    k: int = 8,
    in_dim: int = 64,
    scale: int = 10_000,
    vec_col: str = "embedding",
    comp_scale: int = 1_000_000,
) -> tuple[list[list[int]], list[float]]:
    """Top-k principal components from :func:`pca_covariance` — the
    DATA-DRIVEN complement of random_project (same consumer contract).
    Only the d^2 integer covariance table reaches the driver (bounded
    by in_dim<=256, never by corpus size); eigh runs on the d x d
    matrix locally. Components are sign-fixed (largest-|coefficient|
    entry positive, ties to the lowest index) and quantized to
    ``comp_scale`` integers, so the downstream projection is
    deterministic end-to-end given identical input data.

    Returns (components, explained_variance_ratio): components is a
    k-list of d-lists of ints (quantized eigenvectors, descending
    eigenvalue); ratios are floats for reporting only.
    """
    rows = pca_covariance(df, in_dim=in_dim, scale=scale, vec_col=vec_col).collect()
    d = in_dim
    n = rows[0]["n"] if rows else 0
    if n < 2:
        raise ValueError(f"pca_fit needs >= 2 rows, got {n}")
    C = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        C[r["i"], r["j"]] = r["cov_num"]
    C /= float(n) * float(n) * float(scale) * float(scale)
    evals, evecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps: list[list[int]] = []
    for idx in order:
        v = evecs[:, idx]
        pivot = int(np.argmax(np.abs(np.round(v, 12))))  # ties -> lowest index
        if v[pivot] < 0:
            v = -v
        comps.append([int(x) for x in np.floor(v * comp_scale + 0.5).astype(np.int64)])
    total = float(np.clip(evals, 0, None).sum()) or 1.0
    ratios = [float(max(evals[i], 0.0)) / total for i in order]
    return comps, ratios


def pca_project(
    df: DataFrame,
    components: list[list[int]],
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project vectors onto quantized principal components — the same
    pure-Catalyst integer shape as random_project (zip_with + aggregate
    fold per output dim, zero Python, zero shuffle): y_j = sum_i
    round(x_i*scale) * w_ji. Output long format (id, out_dim, y);
    rescaling by 1/(scale*comp_scale) is the consumer's choice."""
    if not components:
        raise ValueError("components must be non-empty (use pca_fit)")
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
    )
    base = df.select(F.col(id_col), qv.alias("_qv"))
    cols = []
    for j, comp in enumerate(components):
        w = F.array(*[F.lit(int(c)).cast("long") for c in comp])
        y = F.aggregate(
            F.zip_with(F.col("_qv"), w, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        cols.append(y.alias(f"_y{j}"))
    wide = base.select(F.col(id_col), *cols)
    k = len(components)
    stack_args = ", ".join(f"{j}, `_y{j}`" for j in range(k))
    return wide.select(
        F.col(id_col),
        F.expr(f"stack({k}, {stack_args}) AS (out_dim, y)"),
    )


def pca_cov_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two :func:`pca_covariance` tables — the mergeable-state
    pair that makes PCA statistics a CONTINUOUS aggregate (FoldSink):
    n, S_ij, m_i, m_j are plain integer sums per (i, j) cell
    (associative/commutative/exact), and the covariance numerator is
    recomputed from the merged sums. cov(history + delta) ==
    merge(cov(history), cov(delta)) by linearity of all four sums."""
    cols = ["i", "j", "n", "s", "mi", "mj"]
    u = a.select(*cols).unionByName(b.select(*cols))
    return (
        u.groupBy("i", "j")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.sum("mi").alias("mi"),
            F.sum("mj").alias("mj"),
        )
        .select(
            "i",
            "j",
            F.col("n").cast("long"),
            F.col("s").cast("long"),
            F.col("mi").cast("long"),
            F.col("mj").cast("long"),
            (F.col("n") * F.col("s") - F.col("mi") * F.col("mj")).alias("cov_num"),
        )
    )
