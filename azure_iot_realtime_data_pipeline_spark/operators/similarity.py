"""Similarity search over embedding columns (array<float>).

Two paths, as an ANN system would ship them:

- brute-force cosine top-k (`cosine_topk`): exact baseline. The query
  side is small and broadcast; the candidate side streams — one
  broadcast-nested-loop with a per-query top-k window. Cost O(|Q|*|C|):
  correct tool for small query sets / reranking, not the 100 TB path.
- LSH-bucketed top-k (`lsh_topk`): random-hyperplane signatures bucket
  both sides; exact cosine only within colliding buckets. Sub-linear
  candidate generation via an equi-join on the signature — the scale
  path. Hyperplanes are derived deterministically (seeded hash), so
  results are reproducible.

Arithmetic notes: dot/norm are sequential `F.aggregate` folds with every
float32 upcast to float64 *before* multiplying — this makes the result
bit-identical to any other engine doing sequential f64 accumulation
(e.g. the DuckDB oracle), so value-hash comparison works.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.functions.rounding import round_half_up


def dot_f64(a: Column, b: Column) -> Column:
    """Sequential float64 dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_f64(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot_f64(a, b) / (norm_f64(a) * norm_f64(b))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
) -> DataFrame:
    """Exact cosine top-k per query (self-matches excluded).

    Deterministic ranking: (rounded cosine DESC, cand_id ASC) so ties
    break identically across engines.
    """
    from pyspark.sql import Window

    # per-VECTOR norms before the pair expansion: recomputing both
    # norms inside the pair projection would triple the per-pair HOF
    # cost (pairs >> vectors); same fold, bit-identical rounded cosine
    q = queries.select(
        query_id, query_vec, norm_f64(F.col(query_vec)).alias("_qn")
    )
    c = candidates.select(
        cand_id, cand_vec, norm_f64(F.col(cand_vec)).alias("_cn")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col(query_id) != F.col(cand_id))
        .select(
            query_id,
            cand_id,
            round_half_up(
                dot_f64(F.col(query_vec), F.col(cand_vec))
                / (F.col("_qn") * F.col("_cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(cand_id).asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition candidates into
    `n_cells` Voronoi cells around centroids, search only the `n_probe`
    cells nearest each query.

    Centroid choice is DETERMINISTIC — the `n_cells` lowest-id candidate
    vectors — so results are exactly reproducible (and SQL-oracle-able);
    production would swap in k-means centroids (MLlib) with zero plan
    change, since centroids are just a tiny literal table either way.

    Plan shape at 100 TB: cell assignment is a MAP-SIDE argmin over the
    collected centroid literals — zero shuffle of the candidate side.
    (The previous form exploded every candidate x centroid via
    crossJoin(broadcast) then picked the argmin with a
    row_number() window, which shuffled an n_cells-times-amplified copy
    of the big side — the round-2 scale audit's one genuine
    scale-killer.) The only candidate-side exchange left is the
    broadcast-probe equi-join's output window on query_id, which is
    bounded by the probed cells. Recall/latency trade via n_probe.

    Measured local trade-off (sf0.1, local[32], warm): assignment alone
    is 2.0 s map-side vs 0.9 s for the old crossJoin+window — per-row
    interpreted HOF folds against literal arrays cost more than the
    exploded form's column-data folds at this scale. (A codegen-scalar
    variant — 64 staged doubles, 1024-term multiply-add chains — was
    also measured: 4-6 s, the giant expression defeats codegen.) The
    map-side form is kept anyway: locally the delta is ~1 s on one of
    30 headline queries, while at cluster scale the crossJoin form
    shuffles 16x the corpus — the wrong side of the trade by orders of
    magnitude.
    """
    import math

    from pyspark.sql import Window

    cents = (
        candidates.orderBy(F.col(cand_id).asc())
        .limit(n_cells)
        .select(F.col(cand_id).alias("cent_id"), F.col(cand_vec).alias("cent_vec"))
    )
    # n_cells rows by construction: an O(1)-size driver collect (the
    # same table the old plan broadcast), turned into literals so the
    # argmin needs no join at all.
    cent_lits = sorted(
        ((int(r["cent_id"]), [float(x) for x in r["cent_vec"]]) for r in cents.collect()),
    )
    if not cent_lits:
        return (
            F.broadcast(queries.limit(0))
            .crossJoin(candidates.limit(0))
            .select(
                query_id,
                cand_id,
                F.lit(0.0).alias("cosine"),
                F.lit(0).cast("int").alias("rank"),
            )
        )

    def nearest_cells(vec_col: Column, norm_col: Column) -> Column:
        """array<struct<negcos,cent_id>> sorted by (cosine DESC, cent_id
        ASC) — array_sort on struct fields reproduces exactly the old
        row_number() ordering. Centroid norms are Python-computed with
        the same sequential f64 fold as norm_f64, so the rounded cosine
        is bit-identical to the old Spark-side form (and the oracle)."""
        entries = []
        for cid, cvec in cent_lits:
            cnorm = 0.0
            for x in cvec:
                cnorm += x * x
            cnorm = math.sqrt(cnorm)
            cos = round_half_up(
                dot_f64(vec_col, F.array(*[F.lit(v) for v in cvec]))
                / (norm_col * F.lit(cnorm))
            )
            entries.append(
                F.struct((-cos).alias("negcos"), F.lit(cid).cast("long").alias("cent_id"))
            )
        return F.array_sort(F.array(*entries))

    # map-side argmin: stage the norm as a named column (it is referenced
    # once per centroid; inlined it would be re-evaluated per reference).
    # The norm rides along to the pair scoring so it is folded once per
    # VECTOR, not once per probed pair.
    assigned = (
        candidates.select(cand_id, cand_vec, norm_f64(F.col(cand_vec)).alias("_nrm"))
        .select(
            cand_id,
            cand_vec,
            F.col("_nrm").alias("_cn"),
            F.element_at(nearest_cells(F.col(cand_vec), F.col("_nrm")), 1)["cent_id"].alias("cell_id"),
        )
    )

    # each query probes its n_probe nearest cells (same argmin array,
    # sliced instead of indexed; explode is narrow)
    probes = (
        queries.select(query_id, query_vec, norm_f64(F.col(query_vec)).alias("_nrm"))
        .select(
            query_id,
            query_vec,
            F.col("_nrm").alias("_qn"),
            F.explode(
                F.slice(nearest_cells(F.col(query_vec), F.col("_nrm")), 1, n_probe)
            ).alias("_cell"),
        )
        .select(query_id, query_vec, "_qn", F.col("_cell.cent_id").alias("cell_id"))
    )

    # probes = |Q| * n_probe rows — tiny by construction; broadcast it so
    # the big assigned side never shuffles (AQE would otherwise pick SMJ)
    pairs = (
        F.broadcast(probes).join(assigned, "cell_id")
        .filter(F.col(query_id) != F.col(cand_id))
        .select(
            query_id,
            cand_id,
            round_half_up(
                dot_f64(F.col(query_vec), F.col(cand_vec))
                / (F.col("_qn") * F.col("_cn"))
            ).alias("cosine"),
        )
    )
    wk = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(cand_id).asc())
    return pairs.withColumn("rank", F.row_number().over(wk).cast("int")).filter(
        F.col("rank") <= k
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane via splitmix64."""
    vals = []
    state = (plane_idx + 1) * 0x9E3779B97F4A7C15
    for _ in range(dim):
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        vals.append((z / 2**64) * 2.0 - 1.0)
    return vals


def lsh_signature(
    vec: Column, dim: int, num_planes: int = 16, plane_offset: int = 0
) -> Column:
    """Random-hyperplane signature: one bit per plane, packed in a long.

    `plane_offset` selects an independent plane family (table t of an
    OR-amplified index uses offset t*num_planes), so multiple signature
    tables never share a hyperplane."""
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = _hyperplane(dim, plane_offset + p)
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(v) for v in plane]), lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
) -> DataFrame:
    """Approximate top-k: exact cosine among same-signature-bucket pairs.

    Equi-join on the signature replaces the cross product: at 100 TB the
    bucket join shuffles on a single long key (saltable if a bucket is
    hot). Recall is tunable via num_planes (fewer planes -> bigger
    buckets -> higher recall, more compute).
    """
    from pyspark.sql import Window

    q = queries.withColumn(
        "_sig", lsh_signature(F.col(query_vec), dim, num_planes)
    ).withColumn("_qn", norm_f64(F.col(query_vec)))
    c = candidates.withColumn(
        "_sig", lsh_signature(F.col(cand_vec), dim, num_planes)
    ).withColumn("_cn", norm_f64(F.col(cand_vec)))
    pairs = (
        q.join(c, "_sig")
        .filter(F.col(query_id) != F.col(cand_id))
        .select(
            query_id,
            cand_id,
            round_half_up(
                dot_f64(F.col(query_vec), F.col(cand_vec))
                / (F.col("_qn") * F.col("_cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(cand_id).asc())
    return pairs.withColumn("rank", F.row_number().over(w).cast("int")).filter(F.col("rank") <= k)


def _probe_offsets(num_planes: int, hamming: int) -> list[int]:
    """XOR masks for every bucket within `hamming` bit flips of a
    signature (distance 0 first, then 1, then 2)."""
    masks = [0]
    masks += [1 << p for p in range(num_planes)]
    if hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        ]
    return masks


def lsh_topk_multiprobe(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 4,
    n_tables: int = 2,
    hamming: int = 1,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
) -> DataFrame:
    """Multi-probe + OR-amplified LSH top-k: `n_tables` independent
    hyperplane signature tables (table t uses planes t*num_planes ..
    t*num_planes+num_planes-1, so no plane is shared), and within each
    table every query probes its exact bucket plus every bucket within
    `hamming` bit flips. A pair is a candidate if it collides in ANY
    probed bucket of ANY table — the two standard recall levers for
    hyperplane LSH composed (multi-probe: Lv et al., VLDB'07;
    OR-amplification across tables: classic LSH, Indyk & Motwani '98).

    Scale shape: the probe expansion stays a map-side explode of the
    TINY query side (n_tables * (1 + num_planes [+ C(num_planes,2)])
    probe rows per query); the candidate side computes n_tables
    signatures map-side and explodes x n_tables before the single
    equi-join shuffle on (table, signature) — the shuffle-volume
    multiplier is exactly n_tables, and a pair colliding in several
    probed buckets is deduplicated BEFORE the exact-cosine compute.

    Measured on the synthetic sf0.1 embeddings (true top-10 neighbors
    sit at signature Hamming distance 2-4 even with 4 planes — weakly
    clustered data, near-adversarial for hyperplane LSH): the default
    (2 tables x 4 planes, Hamming-1) reaches recall@10 = 0.82 at a
    64.5% candidate-pair fraction vs brute force, against 0.50 at
    31.8% for round 3's single-table form. The full config sweep
    (L in 2..4, planes 4..8, Hamming 1..2) shows no config reaching
    0.8 recall under ~60% pair fraction HERE — on clustered real-world
    embeddings the same construction is sub-linear; on data like this
    IVF (q_ivf_topk, recall 1.00) is the better scale path, which is
    why both ship.
    """
    from pyspark.sql import Window

    qn = queries.withColumn("_qn", norm_f64(F.col(query_vec)))
    cn = candidates.withColumn("_cn", norm_f64(F.col(cand_vec)))
    masks = _probe_offsets(num_planes, hamming)
    # query side: n_tables signatures, each expanded to its probe set,
    # tagged with the table index — all map-side on the tiny side
    q_probe_entries = []
    c_sig_entries = []
    for t in range(n_tables):
        qsig = lsh_signature(F.col(query_vec), dim, num_planes, plane_offset=t * num_planes)
        csig = lsh_signature(F.col(cand_vec), dim, num_planes, plane_offset=t * num_planes)
        q_probe_entries += [
            F.struct(F.lit(t).alias("_t"), qsig.bitwiseXOR(F.lit(m)).alias("_sig"))
            for m in masks
        ]
        c_sig_entries.append(
            F.struct(F.lit(t).alias("_t"), csig.alias("_sig"))
        )
    q = qn.select(
        query_id, query_vec, "_qn", F.explode(F.array(*q_probe_entries)).alias("_p")
    ).select(query_id, query_vec, "_qn", "_p._t", "_p._sig")
    c = cn.select(
        cand_id, cand_vec, "_cn", F.explode(F.array(*c_sig_entries)).alias("_p")
    ).select(cand_id, cand_vec, "_cn", "_p._t", "_p._sig")
    pairs = (
        q.join(c, ["_t", "_sig"])
        .filter(F.col(query_id) != F.col(cand_id))
        # a pair can collide in multiple probed buckets / tables; every
        # duplicate row carries identical (qv, cv), so keeping an
        # arbitrary one is deterministic — and the exact cosine is
        # computed AFTER dedup
        .dropDuplicates([query_id, cand_id])
        .select(
            query_id,
            cand_id,
            round_half_up(
                dot_f64(F.col(query_vec), F.col(cand_vec))
                / (F.col("_qn") * F.col("_cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(cand_id).asc())
    return pairs.withColumn("rank", F.row_number().over(w).cast("int")).filter(F.col("rank") <= k)
