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
