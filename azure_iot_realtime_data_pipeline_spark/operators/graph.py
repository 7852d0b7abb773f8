"""Iterative graph analytics over DataFrame edge lists (J58).

The corpus pipeline's graphs are derived, not stored: near-duplicate
pairs (dedup.ngram_jaccard_pairs / minhash_lsh_candidates) form a
similarity graph whose centrality ranks "hub" documents — templates and
boilerplate that near-duplicate MANY others score high, which makes
PageRank over the dup graph a canonical-selection / boilerplate-triage
signal complementing dedup.duplicate_clusters' connected components
(the other classic iterative dataflow already shipped).

Execution model: rank iteration as repeated DataFrame joins — the
GraphX/Pregel dataflow expressed in plain Spark SQL. Per iteration ONE
shuffle (the contribution aggregate on dst); the rank table is
localCheckpointed every iteration, which truncates the otherwise
exponentially growing lineage (the standard checkpoint-interval trick
of any iterative Spark job). At 100 TB the edge table is the fact:
it is scanned once per iteration and never re-shuffled if pre-bucketed
on src (sources/bucketed.py), and the rank table (one row per node) is
the small side of the join.

No SQL oracle: float power iteration is not ANSI-expressible (same
rows-only class as q_bpe_merges); correctness is gated by a numpy
reference on a fixture graph, an invariant suite (mass conservation,
uniform-graph uniformity), and the driver's rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank).

    Semantics (the classic formulation):
    - nodes = distinct endpoints of `edges`; duplicate (src, dst) rows
      are collapsed (an edge either exists or not — pair generators like
      ngram_jaccard_pairs emit each pair once, but union'd sources may
      not).
    - each iteration: every node divides its rank over its out-edges;
      dangling nodes (no out-edges) redistribute their rank uniformly;
      new_rank = (1-d)/N + d * (received + dangling_mass/N).
    - ranks sum to 1 at every iteration (mass conservation — gated).

    Plan per iteration: ranks ⋈ out_degrees (node-sized, broadcast-able)
    ⋈ edges (the fact, one shuffle on dst for the receive aggregate),
    then a full-outer with the node table to re-seed isolated receivers.
    The dangling mass is a one-row aggregate (the sanctioned scalar
    collect pattern). localCheckpoint per iteration bounds lineage.
    """
    # materialize the dedup'd edge list and the degree table ONCE:
    # every iteration runs TWO jobs (the dangling-mass collect and the
    # ranks localCheckpoint), each of which would otherwise replay the
    # edge distinct + degree aggregate from the source (review r7
    # pass 2 — the docstring's "edges scanned once per iteration"
    # was 2x off without this)
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = (
        e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg")).localCheckpoint()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["_s"], "left"
        ).select("node", "rank", "_deg")
        # dangling mass: one-row aggregate (sanctioned scalar collect)
        dangling = (
            with_deg.filter(F.col("_deg").isNull())
            .agg(F.sum("rank").alias("m"))
            .collect()[0]["m"]
        )
        dangling = float(dangling) if dangling is not None else 0.0
        contribs = (
            with_deg.filter(F.col("_deg").isNotNull())
            .join(e, F.col("node") == e["_s"])
            .select(
                F.col("_d").alias("node"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_recv"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_recv"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def undirected_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Symmetrize a pair table into a directed edge list (both
    directions), the adapter from dedup pair generators (doc_a < doc_b
    by construction) to `pagerank`."""
    return pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionByName(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
