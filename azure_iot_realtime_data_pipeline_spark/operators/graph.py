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
    out_deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    # out-degree is STATIC per node — attach it to the node table ONCE
    # and carry it through every iteration's rank table (r13): the old
    # loop re-joined ranks x out_deg TWICE per round (once under the
    # dangling-mass collect, once under the contribution join); with
    # _deg riding the checkpointed rank rows, the dangling mass is a
    # plain filtered scan and the contribution join starts from the
    # blocks directly.
    nodes_deg = (
        nodes.join(out_deg, nodes["node"] == out_deg["_s"], "left")
        .select("node", "_deg")
        .localCheckpoint()
    )
    ranks = nodes_deg.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        # dangling mass: one-row aggregate (sanctioned scalar collect)
        dangling = (
            ranks.filter(F.col("_deg").isNull())
            .agg(F.sum("rank").alias("m"))
            .collect()[0]["m"]
        )
        dangling = float(dangling) if dangling is not None else 0.0
        contribs = (
            ranks.filter(F.col("_deg").isNotNull())
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
            nodes_deg.join(contribs, "node", "left")
            .select(
                "node",
                "_deg",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_recv"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", "rank")


def pagerank_step_pinned(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """ONE power-iteration step of :func:`pagerank` from the uniform
    start, on the int64 lattice — the SQL-oracle-able companion of the
    rows-only fixpoint (the per-iteration operator IS a join + two
    aggregates; only the float ITERATION is beyond ANSI SQL). Returns
    (node, rank_pinned) where rank_pinned is the post-step rank in
    `scale` units (scale=1e12 => picoranks).

    Exact integer semantics, mirrored verbatim in the DuckDB twin so
    the value hash matches bit-for-bit with zero float drift:

    - ``r0 = scale div N`` (uniform start),
    - each non-dangling node sends ``r0 div out_degree`` along every
      out-edge (BIGINT division),
    - dangling mass ``D = r0 * n_dangling`` redistributes as
      ``D div N`` to every node,
    - ``rank_pinned = ((100 - d) * scale) div (100 * N)
      + (d * (received + D div N)) div 100`` with d = damping_pct.

    Same plan shape as one `pagerank` iteration: degree join keyed on
    src, receive aggregate shuffled once on dst, two one-number driver
    scalars (N, n_dangling — the sanctioned pattern). Max intermediate
    ``100 * scale`` = 1e14, well inside int64.
    """
    d_pct = int(damping_pct)
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_pinned", F.lit(0).cast("long"))
    r0 = int(scale) // n
    out_deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    n_dangling = nodes.join(
        out_deg, nodes["node"] == out_deg["_s"], "left_anti"
    ).count()
    share = (r0 * n_dangling) // n
    base = ((100 - d_pct) * int(scale)) // (100 * n)
    # shuffle_hash hints: the degree side is node-sized (AQE upgrades
    # to broadcast when it fits) and the receive side shares the node
    # key — never a sort-merge at this surface (the repo plan gate)
    recv = (
        e.join(out_deg.hint("shuffle_hash"), "_s")
        .select(
            F.col("_d").alias("node"),
            F.expr(f"CAST({r0} AS BIGINT) div _deg").alias("_c"),
        )
        .groupBy("node")
        .agg(F.sum("_c").alias("_recv"))
    )
    return nodes.join(recv.hint("shuffle_hash"), "node", "left").select(
        "node",
        (
            F.lit(base)
            + F.expr(
                f"({d_pct} * (coalesce(_recv, CAST(0 AS BIGINT))"
                f" + CAST({share} AS BIGINT))) div 100"
            )
        ).alias("rank_pinned"),
    )


def undirected_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Symmetrize a pair table into a directed edge list (both
    directions), the adapter from dedup pair generators (doc_a < doc_b
    by construction) to `pagerank`."""
    return pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionByName(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )


def triangle_stats(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """J60 triangle count + local clustering coefficient per node over
    an undirected pair table; returns (doc_id, degree, triangles,
    clustering). On the near-dup similarity graph, high clustering marks
    tight template families (every variant near-duplicates every other)
    while low clustering at high degree marks boilerplate hubs that
    bridge otherwise-unrelated docs — the structural complement to
    pagerank's centrality.

    Algorithm (the scalable form, not the naive one): DEGREE-ORDERED
    edge orientation — each undirected edge points from its
    (degree, node)-smaller endpoint to the larger. Every triangle then
    has exactly one "pivot" node with two out-edges, so enumerating
    wedges among out-edges and closing them against the oriented edge
    set counts each triangle once, and the wedge fan-out per node is
    bounded by its ORIENTED out-degree — O(m^1.5) work total on any
    graph (the compact-forward / Schank-Wagner bound) versus the
    unbounded hub fan-out of the naive a<b<c self-join. At 100 TB the
    degree table is node-sized (join it hashed, never broadcast a big
    node table), and the two triangle joins are equi-joins on node ids
    — pinned shuffle-hash, edge tables never sort.

    Semantics: duplicate pairs and self-loops are dropped; degree counts
    distinct neighbors; clustering = 2*T / (deg*(deg-1)), rounded
    half-up to 1e-4, NULL when deg < 2. The SQL oracle enumerates the
    same triangles via the ordered a<b<c join — same set, simpler plan,
    fine at oracle scale.
    """
    from azure_iot_realtime_data_pipeline_spark.functions.rounding import (
        round_half_up,
    )

    # The edge table feeds every downstream arm (degrees, orientation,
    # wedges, closing) — without materialization the self-join tree
    # REPLAYS the pair-generation lineage once per arm (~47 copies /
    # 238 exchanges measured on the q_triangles plan). localCheckpoint
    # on each reused table, same as pagerank's edge/degree staging.
    e = (
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    sym = e.select(F.col("u").alias("node"), F.col("v").alias("peer")).unionByName(
        e.select(F.col("v").alias("node"), F.col("u").alias("peer"))
    )
    deg = (
        sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree")).localCheckpoint()
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("_dv"))
    ed = e.hint("shuffle_hash").join(du, "u").hint("shuffle_hash").join(dv, "v")
    ku = F.struct(F.col("_du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("_dv").alias("d"), F.col("v").alias("n"))
    # orient x -> y with (deg, node) of x < y; carry y's order key so
    # wedges among out-edges canonicalize without re-joining degrees.
    e_or = ed.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(ku < kv, kv).otherwise(ku).alias("_ky"),
    ).localCheckpoint()
    e1 = e_or.select("x", F.col("y").alias("y1"), F.col("_ky").alias("_k1"))
    e2 = e_or.select("x", F.col("y").alias("y2"), F.col("_ky").alias("_k2"))
    wedges = (
        e1.hint("shuffle_hash")
        .join(e2, "x")
        .filter(F.col("_k1") < F.col("_k2"))
        .select("x", "y1", "y2")
    )
    closing = e_or.select(F.col("x").alias("y1"), F.col("y").alias("y2"))
    tri = (
        wedges.hint("shuffle_hash")
        .join(closing, ["y1", "y2"])
        .select("x", "y1", "y2")
        .localCheckpoint()
    )
    tn = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y1").alias("node")))
        .unionByName(tri.select(F.col("y2").alias("node")))
    )
    tc = tn.groupBy("node").agg(F.count(F.lit(1)).alias("_t"))
    t = F.coalesce(F.col("_t"), F.lit(0)).cast("long")
    return (
        deg.hint("shuffle_hash")
        .join(tc, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.col("degree").cast("long").alias("degree"),
            t.alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                round_half_up(
                    2.0
                    * t.cast("double")
                    / (
                        F.col("degree").cast("double")
                        * (F.col("degree").cast("double") - 1.0)
                    ),
                    4,
                ),
            ).alias("clustering"),
        )
    )


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star round (Kiveris et al., SoCC'14
    "Connected Components in MapReduce and Beyond"). `edges` is a
    DISTINCT canonical pair table (a > b, no self loops); returns the
    next canonical pair table.

    Large-star: every node u connects each STRICTLY LARGER neighbor to
    m = min(N(u) ∪ {u}) — hubs hand their big neighbors down to their
    smallest one. Small-star: orienting edges high→low, every node u
    connects its smaller neighbors AND ITSELF to the minimum — chains
    collapse toward the component minimum. Both halves are one groupBy
    (the per-node min) + one equi-join fan-out: all-shuffle-on-key,
    no driver data, per-round cost O(|E|)."""
    # large star over the symmetric view
    sym = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("_mn", F.col("u")).alias("m"))
    # node-min tables are node-sized — broadcastable on a smoke graph
    # but fact-sized on a web-scale dup graph, where the static fallback
    # is the repo-banned SortMergeJoin: pin shuffle-hash (the repo-wide
    # pinned-join policy for fact-x-fact edges)
    ls = (
        sym.join(mins.hint("shuffle_hash"), "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.greatest("v", "m").alias("a"), F.least("v", "m").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # small star over the high->low orientation of the large-star output
    mins2 = ls.groupBy("a").agg(F.min("b").alias("m"))
    ss = (
        ls.join(mins2.hint("shuffle_hash"), "a")
        .select(F.col("b").alias("v"), F.col("m"))
        .unionByName(
            mins2.select(F.col("a").alias("v"), F.col("m"))
        )
        .filter(F.col("v") != F.col("m"))
        .select(F.greatest("v", "m").alias("a"), F.least("v", "m").alias("b"))
        .distinct()
    )
    return ss


def connected_components_bigstar(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """J78: connected components by large-star/small-star alternation —
    the O(log n)-round form of dedup.duplicate_clusters' min-label
    propagation, same contract: (doc_id, cluster_id) for every node in
    a pair, cluster_id = MIN id of the component.

    Min-label propagation converges in O(component diameter) rounds —
    the right tool for LSH dup graphs, whose components are near-
    cliques (measured 2-3 rounds). At web scale the dup graph grows
    long chains (A~B~C... via borderline near-dup links) and diameter
    stops being small; the star alternation contracts ANY component in
    O(log n) rounds w.h.p. regardless of diameter (Kiveris et al.,
    SoCC'14), each round one groupBy + one join on the shrinking edge
    set. Measured here on a 48-node path graph (diameter 47): 4 rounds
    vs 47 — the test pins it. Same per-round checkpoint discipline as
    the min-label loop (lineage truncation); convergence = the
    canonical edge set reaching a fixpoint, detected with two bounded
    count jobs per round.

    At fixpoint the edge set IS the component map (stars centered on
    minima); nodes absent from it (singleton inputs, if the pair
    source ever emits a==b) label themselves.
    """
    # materialize the canonical pair table ONCE (r14): edges AND the
    # node universe both derive from it, and each previously carried its
    # own eager checkpoint — the (expensive) candidate-pair lineage ran
    # twice per build. canon is pair-sized, the same bounded class as
    # duplicate_clusters' sym checkpoint.
    canon = pairs.select(
        F.greatest(F.col(id_a), F.col(id_b)).alias("a"),
        F.least(F.col(id_a), F.col(id_b)).alias("b"),
    ).localCheckpoint(eager=True)
    edges = (
        canon.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # node universe from the RAW pairs: a node appearing only in a
    # self-loop still labels itself, matching duplicate_clusters (and
    # the shared recursive-CTE oracle), instead of silently vanishing
    # with the dropped loop edge. Lazy on purpose (r14): it is consumed
    # exactly once by the final join, and its upstream is now the
    # materialized canon scan — an eager checkpoint here was one more
    # job per build for nothing.
    nodes = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .distinct()
    )
    # carry the count across rounds: each edge set is counted ONCE, so
    # a round costs (checkpoint + 1 count) with the union-distinct
    # fixpoint check only on count equality — iterative jobs at
    # micro-scale are dominated by this fixed per-round job overhead
    n_old = edges.count()
    for _ in range(max_iter):
        nxt = _star_round(edges).localCheckpoint(eager=True)
        n_new = nxt.count()
        if n_old == n_new:
            n_union = edges.unionByName(nxt).distinct().count()
            if n_union == n_old:
                edges = nxt
                break
        edges, n_old = nxt, n_new
    else:
        raise RuntimeError(
            f"connected_components_bigstar did not converge in {max_iter} "
            "rounds — raise max_iter (O(log n) expected; this is a "
            "backstop, not a tuning dial)"
        )
    stars = edges.select(F.col("a").alias("node"), F.col("b").alias("label"))
    return (
        nodes.join(stars.hint("shuffle_hash"), "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce("label", "node").alias("cluster_id"),
        )
    )
