"""Iterative graph algorithms as pure DataFrame rounds.

Extension scope (no graph surface in the reference — its analysis is
flat SQL over grid_telemetry, etl_job.py:154-200): the iterative tier
beside operators/dedup.connected_components — PageRank-style score
propagation, the primitive under TextRank keyword extraction and
link-quality scoring in web-corpus curation pipelines.

Same execution discipline as connected_components: each round is a
join + aggregate with an eager localCheckpoint truncating the
otherwise-doubling lineage, and the convergence probe is a filter
over already-materialized rows (isEmpty loop control, never a data
collect). Recompute-after-lost-partition is safe: every round's
content is a deterministic function of the checkpointed previous
round (float sums may differ in final ulps across recomputes, which
is why the consumers round before ranking).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str | None = None, damping: float = 0.85,
             max_iter: int = 15, tol: float = 1e-6) -> DataFrame:
    """Weighted PageRank over a directed edge list → (v, rank), ranks
    summing to ~1. Per round every node distributes damping×rank
    along its out-edges proportional to edge weight; dangling nodes
    (no out-edges) spread their mass uniformly — the standard
    stochastic-matrix completion, kept as a one-row broadcast scalar
    so the loop stays fully declarative (no driver-side mass
    constant). Stops early when no node moves more than ``tol``.

    Scale shape: each round is one edge⋈rank join (shuffle on the
    edge's source key, the same partitioning every round) + one
    aggregate on dst + two one-row scalar attaches. State is one rank
    row per node; the edge list and out-weight table are checkpointed
    ONCE and reused every round."""
    w = (F.col(weight).cast("double") if weight is not None
         else F.lit(1.0))
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"),
                     w.alias("w")).localCheckpoint()
    nodes = (
        e.select(F.col("s").alias("v"))
        .union(e.select(F.col("d").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    n1 = nodes.agg(F.count("*").cast("double").alias("__n"))
    outw = e.groupBy("s").agg(F.sum("w").alias("__ow"))
    ranks = (
        nodes.crossJoin(F.broadcast(n1))
        .select("v", (F.lit(1.0) / F.col("__n")).alias("rank"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # mass leaving via edges: rank_s * w / out_weight_s
        contrib = (
            e.join(outw, "s")
            .join(ranks.select(F.col("v").alias("s"), "rank"), "s")
            .select(F.col("d").alias("v"),
                    (F.col("rank") * F.col("w") / F.col("__ow"))
                    .alias("__c"))
            .groupBy("v").agg(F.sum("__c").alias("__c"))
        )
        # dangling mass: ranks of nodes with no out-edges
        dangling = (
            ranks.join(outw.select(F.col("s").alias("v")), "v",
                       "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        new_ranks = (
            ranks.select("v", F.col("rank").alias("__prev"))
            .join(contrib, "v", "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(n1))
            .select(
                "v",
                (F.lit(1.0 - damping) / F.col("__n")
                 + F.lit(damping)
                 * (F.coalesce(F.col("__c"), F.lit(0.0))
                    + F.col("__dm") / F.col("__n"))).alias("rank"),
                "__prev",
            )
            .withColumn("__moved",
                        F.abs(F.col("rank") - F.col("__prev")) > tol)
            .select("v", "rank", "__moved")
            .localCheckpoint()
        )
        converged = new_ranks.where(F.col("__moved")).isEmpty()
        ranks = new_ranks.select("v", "rank")
        if converged:
            break
    return ranks
