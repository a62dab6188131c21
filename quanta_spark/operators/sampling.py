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
  budget. TWO-PHASE so a mega-stratum never sorts in one task (real
  language mixes have one dominant stratum — at 10^12 docs a
  single-task sort of "en" is the plan that dies): phase 1 computes
  the running sum per (stratum, salt-bucket) — each bucket ~1/S of
  the stratum, S parallel sorts — and discards rows whose LOCAL
  running sum already exceeds the budget; phase 2 runs the exact
  per-stratum windowed cumsum over the survivors only, which is a
  bounded set (<= S x budget tokens per stratum) independent of
  stratum size. Same trade as skew.two_phase_topk.
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


def assign_splits(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's md5 bucket
    (16 bits) falls into one of the cumulative weight ranges, so the
    split is (a) disjoint and exhaustive BY CONSTRUCTION, (b) stable
    across runs/engines/cluster sizes, (c) a pure codegen expression —
    no shuffle, no RNG state, and membership never changes when the
    corpus grows (a new doc lands in a split; old docs never move).
    Weights are quantized to 1/65536."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if any(w <= 0 for w in weights.values()) or abs(sum(weights.values()) - 1.0) > 1e-6:
        raise ValueError(
            f"split weights must be positive and sum to 1, got {weights} "
            f"(sum={sum(weights.values())}) — a mis-sized sum silently "
            "starves later splits"
        )
    bucket = _hash16(F.col(id_col))
    expr = None
    acc = 0.0
    # deterministic range order = insertion order of the dict
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cut = int(acc * 65536)
        cond = bucket < cut
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def token_budget_per_stratum(
    df: DataFrame,
    budget: int | Column,
    stratum_col: str = "lang",
    tokens_col: Column | str = "n_tokens",
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    n_salt: int = 32,
) -> DataFrame:
    """Keep the best rows of each stratum while the RUNNING token sum
    stays within ``budget`` (a row is kept iff the budget still has
    room for it entirely — greedy by rank order). ``order_by`` defines
    "best" (default: most tokens first, id tie-break; a custom order
    must be a TOTAL order for the result to be deterministic).

    Two-phase plan (mega-stratum safe), exact for non-negative token
    counts. The kept set is a PREFIX of the ranked stratum (cumsum is
    non-decreasing), so the job is to find the budget boundary without
    one whole-stratum sort:

    - Phase 1 salts the stratum into ``n_salt`` hash buckets of the
      row id and computes the running sum per (stratum, salt) —
      n_salt parallel bounded sorts. It forwards (a) rows whose LOCAL
      cumsum fits the budget (a superset of the final prefix, since
      local <= global cumsum under the same total order) and (b) each
      bucket's FIRST over-budget row, tagged ``_overflow``. Everything
      past a bucket's first overflow is discarded: its global cumsum
      exceeds its local cumsum, which already exceeds the budget.
    - Phase 2 sorts only the forwarded rows (at most budget-worth per
      bucket + n_salt sentinels, independent of stratum size) and
      keeps a row iff its candidate cumsum fits AND no overflow
      sentinel ranks at-or-before it. Before the earliest sentinel no
      row was discarded, so the candidate cumsum IS the true global
      cumsum there; at and beyond it, the true cumsum is known to
      exceed the budget — the sentinel check is what keeps the
      two-phase result identical to the single-window plan (dropping
      phase-1 losers naively would shrink later rows' cumsum and
      wrongly re-admit them).

    Caveat: rows with 0 tokens never exhaust a local budget, so a
    corpus dominated by empty documents defeats the phase-1 bound —
    filter those first.

    ``budget`` may be a Column (a PER-ROW attribute, constant within
    each stratum — e.g. a per-stratum budget joined in by
    temperature_mix); the two-phase argument is per-stratum, so it
    holds unchanged for any stratum-constant budget.
    """
    budget = F.lit(budget) if isinstance(budget, int) else budget
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    order = order_by or [tokens.desc(), F.col(id_col).asc()]
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
    w_local = (
        Window.partitionBy(stratum_col, "_salt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = (
        df.withColumn("_salt", salt)
        .withColumn("_local_tokens", F.sum(tokens).over(w_local))
    )
    fits = F.col("_local_tokens") <= budget
    first_over = ~fits & ((F.col("_local_tokens") - tokens) <= budget)
    candidates = (
        local.filter(fits | first_over)
        .withColumn("_overflow", (~fits).cast("int"))
        .drop("_salt", "_local_tokens")
    )
    w_global = (
        Window.partitionBy(stratum_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        candidates.withColumn("_running_tokens", F.sum(tokens).over(w_global))
        .withColumn("_any_overflow", F.max("_overflow").over(w_global))
        .filter((F.col("_running_tokens") <= budget) & (F.col("_any_overflow") == 0))
        .drop("_running_tokens", "_any_overflow", "_overflow")
    )


def temperature_mix(
    df: DataFrame,
    budget: int,
    alpha: float = 0.5,
    stratum_col: str = "lang",
    tokens_col: Column | str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-corpus
    sampling rule: per-stratum token share p_i ∝ n_i^alpha, alpha=1 →
    natural proportions, alpha=0 → uniform across strata, alpha<1
    upsamples the tail — the standard way a 100 TB multilingual crawl
    is rebalanced before training): compute corpus token totals per
    stratum, raise to alpha, normalize, and give each stratum a token
    budget floor(budget * p_i), then keep each stratum's greedy prefix
    within its own budget via token_budget_per_stratum's exact
    two-phase plan (mega-stratum safe, no whole-stratum sort).

    100 TB shape: the totals aggregate is one map-side-combined
    groupBy emitting #strata rows; the normalization window runs over
    that #strata-row table (bounded by construction); budgets join
    back BROADCAST (#strata rows). The only corpus-sized work is the
    two-phase prefix itself.

    Output: the kept rows of ``df`` plus ``_budget`` (the stratum's
    token budget)."""
    from pyspark.sql.functions import broadcast

    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    totals = df.groupBy(stratum_col).agg(F.sum(tokens).alias("_n_i"))
    w_all = Window.partitionBy()
    budgets = totals.select(
        stratum_col,
        F.floor(
            F.lit(budget)
            * F.pow("_n_i", F.lit(alpha))
            / F.sum(F.pow("_n_i", F.lit(alpha))).over(w_all)
        ).alias("_budget"),
    )
    withb = df.join(broadcast(budgets), stratum_col)
    return token_budget_per_stratum(
        withb,
        F.col("_budget"),
        stratum_col=stratum_col,
        tokens_col=tokens_col,
        id_col=id_col,
    )


def robust_outliers(
    df: DataFrame,
    value: Column,
    stratum_col: str = "lang",
    k: float = 3.0,
) -> DataFrame:
    """Robust per-stratum outlier flags via median/MAD (the
    data-curation filter that survives heavy tails where mean/stddev
    break): a row is an outlier when |x - median| > k * MAD, both
    statistics computed per stratum with exact linear-interpolation
    percentiles (cross-engine deterministic — q70 evidence).

    Plan: two tiny per-stratum aggregations broadcast back onto the
    corpus — the corpus-sized side never shuffles (stats rows ==
    #strata), so the filter costs two scans at any scale."""
    t = df.select("doc_id", stratum_col, value.cast("double").alias("_x"))
    med = t.groupBy(stratum_col).agg(
        F.expr("percentile(_x, 0.5)").alias("_med")
    )
    d = t.join(F.broadcast(med), stratum_col)
    mad = (
        d.withColumn("_dev", F.abs(F.col("_x") - F.col("_med")))
        .groupBy(stratum_col)
        .agg(F.expr("percentile(_dev, 0.5)").alias("_mad"))
    )
    out = d.join(F.broadcast(mad), stratum_col)
    return out.select(
        "doc_id",
        stratum_col,
        F.col("_x").cast("long").alias("value"),
        F.floor(F.col("_med") * 10_000 + F.lit(0.5)).cast("long").alias("median_bp"),
        F.floor(F.col("_mad") * 10_000 + F.lit(0.5)).cast("long").alias("mad_bp"),
        (F.abs(F.col("_x") - F.col("_med")) > F.lit(k) * F.col("_mad")).alias(
            "is_outlier"
        ),
    )


def shuffle_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE + sharding — the pretraining step
    between curation and packing: every row gets a pseudorandom but
    reproducible position (shard_id, pos) derived ONLY from md5(id),
    so the training order is a fixed permutation of the corpus — no
    RNG state, identical across runs, engines, and input partitioning
    (a re-run after adding one source file reshuffles nothing else).

    shard_id = md5-bucket16(id) % n_shards; pos = rank of md5(id) hex
    within the shard (id tie-break). 100 TB shape: ONE exchange on
    shard_id, then a per-shard window sort — the sort is distributed
    across shards, so size n_shards to the cluster (shards ~ corpus /
    n_shards rows each, hash-balanced); never a global sort."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    w = Window.partitionBy("shard_id").orderBy("_key", id_col)
    return (
        df.withColumn("shard_id", F.pmod(_hash16(F.col(id_col)), F.lit(n_shards)))
        .withColumn("_key", F.md5(F.col(id_col).cast("string")))
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("_key")
    )


def global_prefix_sum(
    df: DataFrame, weight: Column, order_col: str
) -> DataFrame | None:
    """Distributed GLOBAL inclusive prefix sum of ``weight`` in
    ``order_col`` order — the shared machinery behind weighted
    systematic sampling (q78) and causal-LM example packing: coarse
    ``width_bucket`` ranges over ``order_col``, a narrow per-range
    total aggregate (O(n_ranges) rows to the driver — bounded by
    parallelism, not data), broadcast range offsets, then a per-range
    window cumsum. NEVER a one-task whole-corpus window.

    Returns ``df``'s columns plus ``_w`` (the weight, NULL/negative
    clamped to 0, long) and ``_cum`` (inclusive global cumsum), or
    None for an empty input. Raises on NULL ``order_col`` values (a
    NULL key has no position on the axis). Every column of ``df``
    rides through the one prefix-sum exchange — keep the payload
    narrow if the caller doesn't need it downstream."""
    sized = df.withColumn(
        "_w", F.greatest(F.coalesce(weight.cast("long"), F.lit(0)), F.lit(0))
    )
    bounds = sized.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if bounds["lo"] is None:
        return None
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    n_ranges = max(df.sparkSession.sparkContext.defaultParallelism * 4, 4)
    rid = F.width_bucket(
        F.col(order_col).cast("double"), F.lit(lo), F.lit(hi + 1.0), F.lit(n_ranges)
    )
    ranged = sized.withColumn("_rid", rid)
    per_range = (
        ranged.select("_rid", "_w").groupBy("_rid").agg(F.sum("_w").alias("s")).collect()
    )
    if any(r["_rid"] is None for r in per_range):
        raise ValueError(
            f"{order_col} contains NULLs — a NULL key has no position "
            "on the weight axis; filter or impute it first"
        )
    offsets: dict[int, int] = {}
    running = 0
    for r in sorted(per_range, key=lambda r: int(r["_rid"])):
        offsets[int(r["_rid"])] = running
        running += int(r["s"])
    off_map = F.create_map(
        *[x for k, v in sorted(offsets.items()) for x in (F.lit(k), F.lit(v))]
    )
    w = (
        Window.partitionBy("_rid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (off_map[F.col("_rid")] + F.sum("_w").over(w)).cast("long")
    return ranged.withColumn("_cum", cum).drop("_rid")


def systematic_weighted_sample(
    df: DataFrame,
    weight: Column | str,
    stride: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Weighted systematic sampling: lay all rows end-to-end on an
    integer weight axis (in ``order_col`` order) and pick the row under
    every ``stride``-th tick — each row is selected with probability
    proportional to its weight (token count -> token-proportional
    document sampling), deterministically, with no RNG. A row heavier
    than ``stride`` is picked multiple times (``pick_count``).

    The running weight sum is a DISTRIBUTED prefix sum (the
    multimodal.repartition_by_size shape, not a one-task global
    window): coarse ``width_bucket`` ranges over ``order_col``, a
    narrow per-range total aggregate (O(n_ranges) rows to the driver —
    bounded by parallelism, not data), broadcast range offsets, then a
    per-range window cumsum. Weights cross exactly one shuffle.

    Integer-only arithmetic end to end, so a plain SQL window-cumsum
    oracle reproduces the selection exactly (q78)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if isinstance(weight, str):
        weight = F.col(weight)
    # keep the shuffled payload narrow: only (order_col, weight)
    # crosses the prefix-sum exchange
    sized = df.select(F.col(order_col), weight.alias("_wraw"))
    with_cum = global_prefix_sum(sized, F.col("_wraw"), order_col)
    if with_cum is None:
        return sized.select(
            F.col(order_col),
            F.lit(0).cast("long").alias("weight"),
            F.lit(0).cast("long").alias("cum_weight"),
            F.lit(0).cast("long").alias("pick_count"),
        ).limit(0)
    with_cum = with_cum.withColumn(
        "_picks",
        F.expr(f"_cum DIV {int(stride)}") - F.expr(f"(_cum - _w) DIV {int(stride)}"),
    )
    return with_cum.filter(F.col("_picks") > 0).select(
        F.col(order_col),
        F.col("_w").alias("weight"),
        F.col("_cum").alias("cum_weight"),
        F.col("_picks").alias("pick_count"),
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_hex: int = 3,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how much more likely its hashed-bigram features are
    under a TARGET distribution (rows where ``target`` is true, e.g. a
    trusted high-quality slice) than under the raw corpus
    distribution. The canonical "make 100 TB of web text look like
    the target domain" selection operator.

    Features are word bigrams hashed into 16**bucket_hex buckets via
    the first ``bucket_hex`` hex chars of md5 — engine-portable (the
    SQL oracle computes the identical bucket) and collision-folding
    exactly as DSIR prescribes. Per-document log-importance:

        w(d) = sum_f [ ln(ct[b(f)]+1) - ln(cr[b(f)]+1) ] + n_f * C,
        C = ln(Tr + B) - ln(Tt + B)   (add-one smoothing)

    Plan shape at 100 TB: ONE explode (a bigram per token), a groupBy
    on the bucket key whose distinct-count is FIXED (16**bucket_hex =
    4096 by default) so partial aggregation crushes it map-side and
    the bucket table broadcasts; then one per-document aggregation —
    the only real shuffle. No Python anywhere.

    Returns (id_col, n_features, score_e4, selected): score_e4 is the
    weight in 1e-4 units via floor(x*1e4 + 0.5) (portable rounding),
    selected = score > 0 (more target-like than raw) — a pure filter,
    no global sort."""
    b = 16 ** bucket_hex
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    feats = (
        df.select(id_col, target.alias("_is_t"), toks.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(
            id_col,
            "_is_t",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_t) - 1), "
                    f"i -> substring(md5(concat(element_at(_t, i), ' ', "
                    f"element_at(_t, i + 1))), 1, {bucket_hex}))"
                )
            ).alias("bucket"),
        )
    )
    counts = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log(F.col("ct") + 1)
            - F.log(F.col("cr") + 1)
            + F.log(F.col("tr") + b)
            - F.log(F.col("tt") + b)
        ).alias("w"),
    )
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_features"),
            F.floor(F.sum("w") * 10000 + 0.5).cast("long").alias("score_e4"),
        )
        .select(
            id_col,
            "n_features",
            "score_e4",
            (F.col("score_e4") > 0).alias("selected"),
        )
    )
