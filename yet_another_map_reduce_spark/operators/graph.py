"""Iterative graph operators (PageRank; connected components lives in
dedup.py where it serves dup-cluster folding).

The reference cannot express iteration at all — one mapper/reducer pair
per job (``/root/reference/Master/master.py`` runs a single
map-shuffle-reduce pass) — so an iterative algorithm there means N
manual job submissions with intermediate files.  Here each power
iteration is a declarative join+agg and Catalyst/AQE plans every step.

Scale notes: the rank and degree relations are |nodes|-sized — tiny next
to |edges| — so both sides broadcast and an iteration costs ONE shuffle
(the groupBy(dst)).  Cache the edge list; it is reused every iteration.
For node sets too big to broadcast, drop the explicit ``broadcast`` and
pre-partition edges and ranks on the join key so iterations reuse one
co-partitioning.  Lineage stays shallow (a few iterations); for deep
iteration counts add ``localCheckpoint`` every ~10 rounds as
connected_components does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    round_digits: int = 6,
    assume_distinct: bool = False,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list (``src``, ``dst``).

    Classic simplified formulation (as in the Spark examples): every node
    starts at rank 1.0; each iteration a node's rank splits evenly over
    its out-edges and ``new = (1-d) + d * sum(inbound)``.  Dangling-node
    mass is dropped (documented trade-off, not a bug).

    Ranks are rounded to ``round_digits`` after EVERY iteration so the
    fixpoint is bit-stable under double accumulation-order differences —
    required for the chained-CTE SQL oracle to match exactly.
    """
    edges = edges.select("src", "dst")
    if not assume_distinct:
        edges = edges.distinct()
    # hash-partition on dst once and cache: every iteration's groupBy(dst)
    # then reuses this partitioning (broadcast joins preserve it), so the
    # per-iteration exchange disappears from the plan
    edges = edges.repartition("dst").cache()
    # deg and nodes are static across iterations AND appear in every
    # iteration's lineage — cache both or each re-nests per iteration
    # (the 1-shuffle distinct would re-plan 3x per round otherwise)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            edges.join(F.broadcast(ranks), edges.src == ranks.node)
            .join(F.broadcast(deg), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("inbound"))
        )
        # contribs is |nodes|-sized — broadcast it so the rank refresh is
        # map-only instead of a both-sides sort-merge shuffle per iteration
        ranks = (
            nodes.join(F.broadcast(contribs), nodes.node == contribs.dst, "left")
            .select(
                "node",
                F.round(
                    F.lit(1 - damping) + F.lit(damping) * F.coalesce("inbound", F.lit(0.0)),
                    round_digits,
                ).alias("rank"),
            )
        )
    return ranks
