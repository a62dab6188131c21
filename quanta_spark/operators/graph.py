"""Iterative graph algorithms over edge DataFrames.

Connected components (large/small-star) live in dedup.py where they
serve the near-dup pipeline; this module holds general graph analytics
— currently integer fixed-point PageRank, the link-graph quality
signal web-scale curation pipelines use (harmonic/PageRank centrality
over the crawl graph decides what is worth keeping long before any
text filter runs).

Everything here is DETERMINISTIC INTEGER arithmetic by construction:
ranks are fixed-point longs and every division is a floor division, so
two engines (or two cluster runs at different parallelism) compute
bit-identical ranks — the property that makes the operator
oracle-checkable and re-runs reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 8,
    damping_pct: int = 85,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list, in integer fixed-point.

    Semantics (the "remove dangling mass" PageRank variant, Page et
    al. 1999; all divisions FLOOR, all values non-negative longs):

        pr_0(v)   = scale // N
        contrib(v)= sum over in-edges (u -> v) of  pr(u) // outdeg(u)
        pr_i+1(v) = (scale * (100 - damping_pct) // 100) // N
                    + damping_pct * contrib(v) // 100

    Mass lost to floor rounding and dangling nodes is NOT
    redistributed — ranks are comparable, not a probability
    distribution, which is what a quality-signal consumer needs.

    100 TB shape: outdeg is folded into the edge list ONCE
    (edges_with_deg, persisted by the caller if iterating many times);
    each iteration is one src-side equi-join (rank table joins the
    edge list on its partitioning key) plus one dst-keyed aggregate —
    the canonical Pregel superstep, cost O(|E|) per iteration with no
    driver-side data movement except the single node COUNT. Python
    never touches a row. ``iters`` is fixed, so the plan is a linear
    chain of ``iters`` shuffles (each consumed exactly once — no
    re-computation blow-up). Catalyst ANALYSIS cost on that chain is
    superlinear in depth, so every ``checkpoint_every`` iterations the
    rank table's lineage is truncated with a lazy localCheckpoint
    (executor-local blocks; on a real cluster a lost executor recomputes
    from the last checkpoint — acceptable for an idempotent batch job,
    and the alternative, a reliable checkpoint dir, is one setting away
    for callers that need it).

    Returns (node, pr) with pr in fixed-point ``scale`` units.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    if scale % 100 != 0:
        raise ValueError(f"scale must be divisible by 100, got {scale}")

    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # the ONLY driver-side value: |V| (a single long; the same bounded
    # class as the interval-join stats aggregate, asof.py)
    n_nodes = nodes.count()
    teleport = (scale * (100 - damping_pct) // 100) // n_nodes
    init = scale // n_nodes

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ewd = e.join(outdeg, "src")  # deg repeats per edge; joined once

    pr = nodes.select("node", F.lit(init).cast("long").alias("pr"))
    for i in range(iters):
        if i > 0 and i % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=False)
        contrib = (
            ewd.join(pr.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("pr div deg")).alias("contrib"))
        )
        pr = nodes.join(
            contrib.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            (
                F.lit(teleport)
                + F.expr(f"{damping_pct} * coalesce(contrib, 0L) div 100")
            ).cast("long").alias("pr"),
        )
    return pr


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact per-vertex triangle counts via degree-ordered orientation
    (Cohen 2009 / Suri-Vassilvitskii WWW'11 — the MapReduce-scalable
    formulation): orient every undirected edge from its lower-(degree,
    id) endpoint to the higher one, enumerate wedges only at each
    edge's LOWER endpoint, and close them against the edge set.

    Why this survives 100 TB graphs: after orientation every vertex's
    OUT-degree is O(sqrt(m)) regardless of its in-degree — a celebrity
    node with 10^8 followers contributes no wedges from its follower
    side — so the wedge join (the only super-linear step) is bounded
    by sum(out_deg^2) <= m^1.5 instead of the unbounded sum(deg^2) a
    naive neighbor join pays. All steps are equi-joins / aggregates on
    vertex keys (AQE handles residual skew); nothing collects.

    Input is treated as UNDIRECTED: reverse duplicates, repeated edges
    and self-loops are normalized away first. Returns (v, n_tri) for
    every vertex in at least one triangle — exact integer counts, so
    any engine computes the identical table.
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    ed = und.join(da, "a").join(db, "b")
    # orient low-(deg, id) -> high-(deg, id): a total order, so every
    # triangle has exactly one apex with both out-edges
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    )
    o1 = oriented.select("u", F.col("w").alias("w1"))
    o2 = oriented.select("u", F.col("w").alias("w2"))
    wedges = o1.join(o2, "u").filter(F.col("w1") < F.col("w2"))
    tri = wedges.join(
        und,
        (F.col("w1") == F.col("a")) & (F.col("w2") == F.col("b")),
    ).select("u", "w1", "w2")
    verts = (
        tri.select(F.col("u").alias("v"))
        .unionAll(tri.select(F.col("w1").alias("v")))
        .unionAll(tri.select(F.col("w2").alias("v")))
    )
    return verts.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
