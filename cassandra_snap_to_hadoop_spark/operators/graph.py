"""Bounded-iteration graph propagation on the integer lattice.

PageRank (power iteration) is the canonical "iterative join+agg" workload a
general analytics engine must express; Spark's native shape is a short
Python loop that *builds one declarative plan per iteration* (join ranks to
edges, hash-aggregate contributions per destination) — no RDDs, no
driver-side adjacency, nothing materialized per node on the driver.

Float discipline (the j23/j41 integer rule, applied to an ITERATIVE
algorithm): ranks live on a scaled int64 lattice (1.0 == 10^12).  Each step
is   r' = BASE + (85 * Σ_in (r DIV outdeg)) DIV 100   — integer division
both engines define identically (truncation; all operands non-negative
here), so after ANY number of iterations both engines hold bit-identical
BIGINTs.  A float formulation would diverge by association order on the
very first Σ_in.

Overflow budget: per-node rank is bounded by the total mass
M ≈ N·(BASE·100/15) = N·10^12; 85·Σ_in ≤ 85·M must stay < 2^63, which
holds to N ≈ 10^5 nodes at this SCALE.  At larger N, shrink SCALE/BASE
proportionally (the recursion is scale-invariant) — documented rather than
auto-derived so the lattice stays a compile-time constant in both engines.

Scale shape: edges are shuffled ONCE onto src (the outdeg join), then each
iteration is one shuffle of |edges| contribution rows into a per-dst hash
agg.  The edge+outdeg frame is localCheckpoint-ed so the distinct/join
subtree is not re-derived once per iteration (the llm_curation_funnel
lineage-cut precedent); at cluster scale the same call site would be a
persisted table or checkpoint per k iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # rank 1.0 on the integer lattice
BASE = 150_000_000_000  # (1-d) teleport term, d = 0.85


def pagerank_int(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Power-iterate PageRank over symmetric ``(src, dst)`` long edges.

    Returns (node, rank_scaled).  Requires every node to appear as a src
    (symmetric edge lists satisfy this), so there are no dangling nodes
    and no rank mass needs redistribution.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    # One shuffle to co-locate edges with outdeg; checkpoint cuts the
    # distinct+join lineage out of every iteration's plan.
    e = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = (
        e.select("src").distinct().select(F.col("src").alias("node"), F.lit(SCALE).alias("r"))
    )
    for _ in range(iters):
        contrib = e.join(ranks, e["src"] == ranks["node"]).select(
            F.col("dst"), F.expr("r div outdeg").alias("c")
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (F.lit(BASE) + F.expr("(85 * sum(c)) div 100")).cast("long").alias("r")
        )
    return ranks
