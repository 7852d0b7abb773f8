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
    pairs = _cosine_pairs(
        queries, candidates, query_id, cand_id, query_vec, cand_vec
    )
    return _rank_topk(pairs, k, query_id, cand_id)


def _cosine_pairs(
    queries: DataFrame,
    candidates: DataFrame,
    query_id: str,
    cand_id: str,
    query_vec: str,
    cand_vec: str,
) -> DataFrame:
    """(query_id, cand_id, cosine) for every query x candidate pair,
    self-matches excluded. Per-VECTOR norms before the pair expansion:
    recomputing both norms inside the pair projection would triple the
    per-pair HOF cost (pairs >> vectors); same fold, bit-identical
    rounded cosine."""
    q = queries.select(
        query_id, query_vec, norm_f64(F.col(query_vec)).alias("_qn")
    )
    c = candidates.select(
        cand_id, cand_vec, norm_f64(F.col(cand_vec)).alias("_cn")
    )
    return (
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


def _rank_topk(pairs: DataFrame, k: int, query_id: str, cand_id: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(cand_id).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def hard_negatives(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    dup_threshold: float = 0.99,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
) -> DataFrame:
    """J57: hard-negative mining for embedding/retriever training — per
    query, the top-k most similar candidates that are NOT near-
    duplicates (rounded cosine < `dup_threshold`). Near-dup pairs are
    positives (or label noise) in a contrastive batch, so they are
    excluded BEFORE the rank: a candidate above the threshold does not
    occupy one of the k slots, it is invisible.

    Same deterministic rank contract as `cosine_topk` ((cosine DESC,
    cand_id ASC)) and the same plan shape: broadcast queries, stream
    candidates, per-query top-k via TakeOrderedAndProject-style window —
    the candidate side never shuffles. At 100 TB swap the exact pair
    scoring for the IVF/LSH candidate generation (`ivf_topk`/`lsh_topk`)
    with an over-fetched k, then apply the same dup-filter + re-rank on
    the bounded candidate set — the standard mine-from-ANN recipe.
    """
    pairs = _cosine_pairs(
        queries, candidates, query_id, cand_id, query_vec, cand_vec
    ).filter(F.col("cosine") < dup_threshold)
    return _rank_topk(pairs, k, query_id, cand_id)


def _kmeans_centroids(
    candidates: DataFrame,
    cand_vec: str,
    n_cells: int,
    seed: int = 7,
    sample_fraction: float = 1.0,
) -> list[tuple[int, list[float]]]:
    """MLlib k-means cluster centers as the IVF centroid literal table:
    the PRODUCTION centroid choice (tighter Voronoi cells -> better
    recall per probe than any fixed pick). Returns the same
    (cent_id, vec) shape the deterministic path produces, so the rest
    of the IVF plan is byte-identical — centroids are a tiny literal
    table either way.

    At 100 TB, fit on a SAMPLE (`sample_fraction`): k-means quality
    converges long before the full corpus is seen, and the fit is a
    separate bounded job — the index-build pass of any ANN system.
    Seeded, so a given session/dataset reproduces its centroids; unlike
    the deterministic default, centers are float arithmetic and NOT
    SQL-oracle-able (which is why the oracle path keeps lowest-id
    centroids)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fit_df = candidates.select(
        array_to_vector(F.col(cand_vec).cast("array<double>")).alias("features")
    )
    if sample_fraction < 1.0:
        fit_df = fit_df.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_cells, seed=seed).fit(fit_df)
    return [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]


def deterministic_centroids(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
) -> list[tuple[int, list[float]]]:
    """The `n_cells` lowest-id candidate vectors as a centroid literal
    table — exactly reproducible and SQL-oracle-able (the parity path
    shared by ivf_topk and dedup.semantic_dedup). An O(1)-size driver
    collect: n_cells rows by construction, the same table the old plan
    broadcast, turned into literals so assignment needs no join."""
    cents = (
        candidates.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
    )
    return sorted(
        (int(r["cent_id"]), [float(x) for x in r["cent_vec"]]) for r in cents.collect()
    )


def assign_to_centroids(
    df: DataFrame,
    cent_lits: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Map-side numpy argmin cell assignment over a centroid literal
    table: returns (id, vec, _cn, cell_id) with ZERO shuffle of `df`
    (narrow Arrow `mapInPandas`). Extracted from ivf_topk in late r5 so
    semantic dedup shares the identical, bit-pinned arithmetic.

    Bit parity with the Catalyst expression form is preserved by
    construction: per element the dot/norm accumulate in ascending dim
    order (acc = acc + v[k]*c[k], exactly norm_f64/dot_f64's sequential
    f64 fold — numpy's pairwise np.dot would NOT match), the cosine
    rounds via the same floor(x*1e4+0.5)/1e4, and ties resolve to the
    lowest cent_id by iterating centroids in ascending id order with a
    strict > update. The emitted _cn is the same sequential-fold norm
    downstream pair scoring needs, folded once per vector. NULL and
    zero-norm vectors are dropped (the expression form scored them NULL
    and they joined nothing downstream)."""
    import math as _math

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    id_type = df.schema[id_col].dataType
    vec_type = df.schema[vec_col].dataType

    def fn(batches):
        import numpy as np
        import pandas as pd

        cents = []
        for cid, cvec in cent_lits:  # cent_lits is sorted ascending cid
            acc = 0.0
            for x in cvec:
                acc += x * x
            cents.append((cid, np.asarray(cvec, dtype=np.float64), _math.sqrt(acc)))
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n, d = v.shape
            nrm = np.zeros(n)
            for k in range(d):
                nrm = nrm + v[:, k] * v[:, k]
            nrm = np.sqrt(nrm)
            nz = nrm > 0.0
            if not nz.all():
                pdf, v, nrm = pdf[nz], v[nz], nrm[nz]
                n = len(nrm)
                if n == 0:
                    continue
            best = np.full(n, -np.inf)
            bid = np.zeros(n, dtype=np.int64)
            for cid, c, cn in cents:
                acc = np.zeros(n)
                for k in range(d):
                    acc = acc + v[:, k] * c[k]
                cos = np.floor((acc / (nrm * cn)) * 10000.0 + 0.5) / 10000.0
                take = cos > best
                best = np.where(take, cos, best)
                bid = np.where(take, cid, bid)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col].to_numpy(),
                    "_cn": nrm,
                    "cell_id": bid,
                }
            )

    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField(vec_col, vec_type),
            StructField("_cn", DoubleType()),
            StructField("cell_id", LongType()),
        ]
    )
    return df.select(id_col, vec_col).mapInPandas(fn, schema)


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
    centroids: str = "deterministic",
    kmeans_seed: int = 7,
    kmeans_sample_fraction: float = 1.0,
    dup_threshold: float | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition candidates into
    `n_cells` Voronoi cells around centroids, search only the `n_probe`
    cells nearest each query.

    `dup_threshold` (optional) excludes near-duplicate pairs (rounded
    cosine >= threshold) BEFORE the rank — the ANN form of
    `hard_negatives`: overfetch is unnecessary because the filter runs
    on the scored candidate pairs, so survivors simply fill the k
    slots. This is the documented 100 TB mine-from-ANN recipe.

    Centroid choice: `centroids="deterministic"` (default) takes the
    `n_cells` lowest-id candidate vectors — exactly reproducible and
    SQL-oracle-able, the parity path; `centroids="kmeans"` fits MLlib
    k-means (seeded; optionally on a sample) — the PRODUCTION path with
    tighter cells and recall >= the deterministic baseline (gated in
    tests). Both produce the same tiny literal table, so the plan is
    identical from the assignment down.

    Plan shape at 100 TB: cell assignment is a MAP-SIDE argmin over the
    collected centroid literals — zero shuffle of the candidate side.
    (The previous form exploded every candidate x centroid via
    crossJoin(broadcast) then picked the argmin with a
    row_number() window, which shuffled an n_cells-times-amplified copy
    of the big side — the round-2 scale audit's one genuine
    scale-killer.) The only candidate-side exchange left is the
    broadcast-probe equi-join's output window on query_id, which is
    bounded by the probed cells. Recall/latency trade via n_probe.

    Implementation history of the argmin (A/B-measured at sf0.1): the
    r2 crossJoin+window form was fast locally (0.9 s) but shuffled a
    16x-amplified copy of the corpus — the scale-killer. The r3
    expression form (literal-array HOF folds / a codegen-scalar
    variant) fixed the shuffle but cost 2-6 s locally: 16 centroids x
    64 literal dims built through py4j per plan (~2 s of driver time)
    and 1024-term folds that defeat codegen. The r4 form runs the SAME
    sequential-f64 arithmetic numpy-vectorized inside Arrow
    `mapInPandas` — bit-identical rounded cosines (accumulation in
    ascending dim order, same floor-rounding, ties to lowest cent_id),
    zero candidate shuffle, and ~1 s total locally.
    """
    from pyspark.sql import Window

    if isinstance(centroids, list):
        # pre-fit centroid literals [(cent_id, [dims...]), ...] — the
        # persisted-index path (save_ivf_index/ivf_topk_from_index):
        # fit once, search many; everything downstream is identical
        cent_lits = centroids
    elif centroids == "kmeans":
        # production centroid path (see _kmeans_centroids); everything
        # downstream of the literal table is identical
        cent_lits = _kmeans_centroids(
            candidates, cand_vec, n_cells, kmeans_seed, kmeans_sample_fraction
        )
    elif centroids == "deterministic":
        cent_lits = deterministic_centroids(candidates, cand_id, cand_vec, n_cells)
    else:
        raise ValueError(
            "centroids must be 'deterministic', 'kmeans', or a pre-fit "
            f"[(cent_id, vec), ...] list, got {centroids!r}"
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

    # map-side argmin over the candidate side, numpy-vectorized (r4;
    # extracted to assign_to_centroids in late r5): the expression form
    # folded 16 centroids x 64 dims of interpreted HOF per ROW (~2 s of
    # the 3.7 s local cost); the Arrow mapInPandas form runs the same
    # arithmetic as 64 vectorized column ops per centroid per BATCH,
    # bit-pinned to the expression path (see assign_to_centroids). Plan
    # shape unchanged: scan -> narrow map -> broadcast probe join; the
    # candidate side still never shuffles.
    import math as _math

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    assigned = assign_to_centroids(candidates, cent_lits, cand_id, cand_vec)

    # each query probes its n_probe nearest cells — the same numpy
    # arithmetic, ranked by (cosine DESC, cent_id ASC) exactly as the
    # old array_sort over (negcos, cent_id) structs. (The expression
    # form of this probe/assignment pair was the real local cost of the
    # r3 operator: building 16 centroids x 64 literal dims through py4j
    # took ~2 s of driver time per plan and its 1024-term folds defeated
    # codegen — see BASELINE.md r4 row.)
    query_id_type = queries.schema[query_id].dataType
    query_vec_type = queries.schema[query_vec].dataType

    def _make_probe_fn(lits, id_name, vec_name, nprobe):
        def fn(batches):
            import numpy as np
            import pandas as pd

            cents = []
            for cid, cvec in lits:
                acc = 0.0
                for x in cvec:
                    acc += x * x
                cents.append((cid, np.asarray(cvec, dtype=np.float64), _math.sqrt(acc)))
            cids = np.asarray([c[0] for c in cents], dtype=np.int64)
            for pdf in batches:
                # NULL vectors: the expression form scored them NULL and
                # they joined nothing downstream — drop, same semantics
                pdf = pdf[pdf[vec_name].notna()]
                if not len(pdf):
                    continue
                v = np.stack(pdf[vec_name].to_numpy()).astype(np.float64)
                n, d = v.shape
                nrm = np.zeros(n)
                for k in range(d):
                    nrm = nrm + v[:, k] * v[:, k]
                nrm = np.sqrt(nrm)
                # zero-norm probes: same NULL-cell drop semantics as
                # the assign fn above
                nz = nrm > 0.0
                if not nz.all():
                    pdf, v, nrm = pdf[nz], v[nz], nrm[nz]
                    n = len(nrm)
                    if n == 0:
                        continue
                cos = np.zeros((n, len(cents)))
                for j, (_cid, c, cn) in enumerate(cents):
                    acc = np.zeros(n)
                    for k in range(d):
                        acc = acc + v[:, k] * c[k]
                    cos[:, j] = np.floor((acc / (nrm * cn)) * 10000.0 + 0.5) / 10000.0
                out_id, out_vec, out_qn, out_cell = [], [], [], []
                ids_np = pdf[id_name].to_numpy()
                vecs_np = pdf[vec_name].to_numpy()
                for i in range(n):
                    # lexsort: last key is primary -> (cosine DESC, cid ASC)
                    order = np.lexsort((cids, -cos[i]))[:nprobe]
                    for j in order:
                        out_id.append(ids_np[i])
                        out_vec.append(vecs_np[i])
                        out_qn.append(nrm[i])
                        out_cell.append(cids[j])
                yield pd.DataFrame(
                    {
                        id_name: out_id,
                        vec_name: out_vec,
                        "_qn": out_qn,
                        "cell_id": out_cell,
                    }
                )

        return fn

    probe_schema = StructType(
        [
            StructField(query_id, query_id_type),
            StructField(query_vec, query_vec_type),
            StructField("_qn", DoubleType()),
            StructField("cell_id", LongType()),
        ]
    )
    probes = queries.select(query_id, query_vec).mapInPandas(
        _make_probe_fn(cent_lits, query_id, query_vec, n_probe), probe_schema
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
    if dup_threshold is not None:
        # hard-negative mode: near-dups are invisible, not slot-eaters
        pairs = pairs.filter(F.col("cosine") < dup_threshold)
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


def with_plane_signatures(
    df: DataFrame,
    vec_col: str,
    dim: int,
    num_planes: int,
    offsets: list[int],
    norm_col: str | None = None,
) -> DataFrame:
    """Append one packed hyperplane-signature long per plane-family
    offset (columns `_sig0.._sigN` in offset order) and optionally the
    vector norm — numpy-vectorized in Arrow `mapInPandas`.

    Bit-identical to `lsh_signature` / `norm_f64` by construction: each
    projection accumulates x[k]*plane[k] in ascending dim order (the
    sequential f64 fold — numpy's pairwise np.dot would NOT match), the
    bit test is the same strict `proj > 0`, and the norm is the same
    sequential square-sum. The expression forms cost ~0.25 s of py4j
    driver time per 64-dim plane per plan and interpret 64-term folds
    per row; this form is one narrow Arrow pass for ALL planes. Input
    columns pass through untouched. NULL vectors are DROPPED: the
    expression form gave them a NULL signature, which can never satisfy
    an equi-join, so for every bucket-join consumer the semantics are
    identical (and np.stack cannot represent them).
    """
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    planes_by_offset = [
        [_hyperplane(dim, off + p) for p in range(num_planes)] for off in offsets
    ]
    sig_names = [f"_sig{i}" for i in range(len(offsets))]

    def fn(batches):
        import numpy as np

        pl = [
            [np.asarray(p, dtype=np.float64) for p in fam]
            for fam in planes_by_offset
        ]
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n, d = v.shape
            out = pdf.copy()
            for name, fam in zip(sig_names, pl):
                sig = np.zeros(n, dtype=np.int64)
                for p, plane in enumerate(fam):
                    acc = np.zeros(n)
                    for k in range(d):
                        acc = acc + v[:, k] * plane[k]
                    sig = sig + np.where(acc > 0, np.int64(1 << p), np.int64(0))
                out[name] = sig
            if norm_col is not None:
                nrm = np.zeros(n)
                for k in range(d):
                    nrm = nrm + v[:, k] * v[:, k]
                out[norm_col] = np.sqrt(nrm)
            yield out

    fields = list(df.schema.fields) + [
        StructField(nm, LongType()) for nm in sig_names
    ]
    if norm_col is not None:
        fields.append(StructField(norm_col, DoubleType()))
    return df.mapInPandas(fn, StructType(fields))


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

    q = with_plane_signatures(
        queries, query_vec, dim, num_planes, [0], norm_col="_qn"
    ).withColumnRenamed("_sig0", "_sig")
    c = with_plane_signatures(
        candidates, cand_vec, dim, num_planes, [0], norm_col="_cn"
    ).withColumnRenamed("_sig0", "_sig")
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

    offsets = [t * num_planes for t in range(n_tables)]
    qsigs = with_plane_signatures(
        queries, query_vec, dim, num_planes, offsets, norm_col="_qn"
    )
    csigs = with_plane_signatures(
        candidates, cand_vec, dim, num_planes, offsets, norm_col="_cn"
    )
    masks = _probe_offsets(num_planes, hamming)
    # query side: each table signature expands to its probe set, tagged
    # with the table index; candidate side explodes one row per table —
    # both are cheap expressions over the numpy-computed sig COLUMNS
    # (the signatures themselves are the heavy part, done in one Arrow
    # pass above)
    q_probe_entries = [
        F.struct(
            F.lit(t).alias("_t"),
            F.col(f"_sig{t}").bitwiseXOR(F.lit(m)).alias("_sig"),
        )
        for t in range(n_tables)
        for m in masks
    ]
    c_sig_entries = [
        F.struct(F.lit(t).alias("_t"), F.col(f"_sig{t}").alias("_sig"))
        for t in range(n_tables)
    ]
    q = qsigs.select(
        query_id, query_vec, "_qn", F.explode(F.array(*q_probe_entries)).alias("_p")
    ).select(query_id, query_vec, "_qn", "_p._t", "_p._sig")
    c = csigs.select(
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


def quantize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """J64 per-vector scalar quantization (the FAISS SQ8 recipe,
    public): each vector stores `bits`-bit integer codes plus its own
    (lo, hi) range — 4x smaller than f32 at bits=8, the storage/IO
    lever that decides whether a 100 TB embedding corpus fits the
    cluster's SSDs. code = floor((x-lo)/(hi-lo)*(2^bits-1)+0.5);
    constant vectors (hi == lo) encode to all-zero codes and dequantize
    to lo exactly. Pure map-side HOF arithmetic — identical formula
    text reproduces bit-for-bit in any IEEE SQL engine.

    Returns (id, codes array<int>, lo double, hi double)."""
    levels = float((1 << int(bits)) - 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    lo = F.array_min(v)
    hi = F.array_max(v)
    staged = emb.select(
        F.col(id_col), v.alias("_v"), lo.alias("lo"), hi.alias("hi")
    )
    span = F.col("hi") - F.col("lo")
    codes = F.transform(
        F.col("_v"),
        lambda x: F.when(span > 0,
            F.floor((x - F.col("lo")) / span * F.lit(levels) + 0.5).cast("int")
        ).otherwise(F.lit(0)),
    )
    return staged.select(F.col(id_col), codes.alias("codes"), "lo", "hi")


def dequantize_vec(codes, lo, hi, bits: int = 8):
    """array<double> reconstruction: lo + code * (hi-lo) / levels."""
    levels = float((1 << int(bits)) - 1)
    return F.transform(
        codes, lambda c: lo + c.cast("double") * (hi - lo) / F.lit(levels)
    )


def quantized_topk(
    emb: DataFrame,
    k: int = 10,
    n_queries: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """J64 exact cosine top-k over QUANTIZED storage: both sides pass
    through the SQ8 codes and reconstruct before scoring — the result a
    reader of the compressed corpus would get, rank ties broken like
    cosine_topk ((rounded cosine DESC, cand_id ASC)). A recall gate in
    tests pins reconstruction quality against the full-precision
    ranking (the quantization-error budget, measured not assumed)."""
    q8 = quantize_embeddings(
        emb.filter(F.col(id_col) < n_queries), vec_col, id_col, bits
    )
    c8 = quantize_embeddings(emb, vec_col, id_col, bits)
    q = q8.select(
        F.col(id_col).alias("query_id"),
        dequantize_vec(F.col("codes"), F.col("lo"), F.col("hi"), bits).alias("qv"),
    )
    c = c8.select(
        F.col(id_col).alias("cand_id"),
        dequantize_vec(F.col("codes"), F.col("lo"), F.col("hi"), bits).alias("cv"),
    )
    return cosine_topk(q, c, k=k)


def jl_signs(in_dim: int, out_dim: int) -> list[list[float]]:
    """J66: the deterministic Rademacher (+-1) projection matrix for
    Johnson-Lindenstrauss dim reduction, as out_dim sign rows of length
    in_dim. md5-derived bits: the signs only need DETERMINISM (both the
    Spark operator and the generated DuckDB oracle inline the literal
    rows — nothing recomputes the formula at query time), and proper
    bit mixing matters: a first-cut linear-congruential formula here
    produced DUPLICATE rows (pairwise row correlation 1.0 — the parity
    of a linear form factorizes), silently halving the effective
    out_dim."""
    import hashlib

    rows = []
    for j in range(out_dim):
        row = []
        for i in range(in_dim):
            b = hashlib.md5(f"jl:{i}:{j}".encode()).digest()[0]
            row.append(1.0 if b % 2 == 0 else -1.0)
        rows.append(row)
    return rows


def jl_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_dim: int = 16,
    in_dim: int = 64,
) -> DataFrame:
    """J66 Johnson-Lindenstrauss projection: array<float>[in_dim] ->
    array<double>[out_dim] via a deterministic +-1 matrix — the
    standard embedding-compression step before ANN at scale (4x fewer
    dims = 4x less candidate IO; JL bounds the pairwise-distance
    distortion). Entirely map-side: out_dim sequential f64 folds per
    row, zero shuffles, whole-stage codegen.

    Each component is pinned to integer micro-units (the repo's
    order-free domain) so every downstream cosine/distance computes on
    EXACT integer-valued doubles — products < 2^53 stay exact, sqrt and
    divide are IEEE-correctly-rounded, hence bit-identical on any
    engine (the cosine itself needs no rounding allowance beyond the
    output's usual 4 dp). The 1/sqrt(out_dim) JL scale is dropped:
    cosine is scale-invariant and the micro pin fixes the magnitude.

    Arrow mapInPandas, NOT an expression tree (the r4 IVF lesson,
    re-measured here: 32 zip_with folds over 64-double literal rows
    cost ~3 s of py4j PLAN-BUILD per construction and defeat codegen;
    the numpy form is the same arithmetic — multiply then add,
    SEQUENTIALLY over input dims, vectorized over rows — so every
    partial sum is the bit-identical IEEE double the fold produced,
    and the generated oracle still matches hash-for-hash). Input
    vectors must be non-NULL, in_dim-long, finite (the embeddings
    contract; the pin skips micro_units' non-finite guard)."""
    signs = jl_signs(in_dim, out_dim)

    def project(batches):
        import numpy as np
        import pandas as pd

        sm = np.array(signs, dtype=np.float64)  # out_dim x in_dim
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n = v.shape[0]
            out = np.empty((n, sm.shape[0]), dtype=np.float64)
            for j in range(sm.shape[0]):
                acc = np.zeros(n, dtype=np.float64)
                for i in range(sm.shape[1]):
                    acc = acc + v[:, i] * sm[j, i]
                out[:, j] = np.floor(acc * 1_000_000.0 + 0.5)
            yield pd.DataFrame({id_col: pdf[id_col], "jl": list(out)})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        project, schema=f"{id_col} {id_type}, jl array<double>"
    )


def jl_topk(
    emb: DataFrame,
    k: int = 10,
    n_queries: int = 5,
    out_dim: int = 32,
    in_dim: int = 64,
) -> DataFrame:
    """J66 top-k cosine in JL-projected space: the compressed-search
    recipe — project once (map-side), then the exact top-k machinery
    runs over out_dim-wide vectors instead of in_dim. Recall vs
    full-precision top-k is measured and gated in tests, not assumed.
    ensure_parallelism is load-bearing: the single-file embeddings
    parquet otherwise runs the out_dim x in_dim projection folds for
    every candidate in ONE task (measured 4.6 s single-task vs 0.9 s
    spread at sf0.1 — the q_top_ngrams incident class)."""
    from azure_iot_realtime_data_pipeline_spark.sources.batch import (
        ensure_parallelism,
    )

    proj = jl_project(ensure_parallelism(emb), out_dim=out_dim, in_dim=in_dim)
    q = proj.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("jl").alias("qv")
    )
    c = proj.select(
        F.col("vec_id").alias("cand_id"), F.col("jl").alias("cv")
    )
    return cosine_topk(q, c, k=k)


def embedding_covariance(
    emb: DataFrame,
    vec_col: str = "embedding",
    in_dim: int = 64,
) -> DataFrame:
    """J72 exact embedding covariance matrix — the PCA/whitening prep
    and the drift diagnostic one level above J55's centroids (means
    move slowly; covariance catches a collapsing or rotating embedding
    space). Upper triangle of the in_dim x in_dim matrix as
    (i, j, cov) rows.

    The 100 TB shape is the map-side partial Gram: each Arrow batch
    computes its own X^T X ONCE in numpy and emits in_dim*(in_dim+1)/2
    partial rows; one bounded groupBy over (i, j) merges partitions —
    the classic tree aggregation, never a per-element explode+self-join
    (that is a 64x row fan-out THROUGH a shuffle). First moments ride
    the same partials as the j = -1 diagonal-extension rows.

    Exactness: each element PAIR product pins to int64 micro BEFORE any
    summation (floor(xi*xj*1e6+0.5) — float32 inputs upcast exactly, a
    single correctly-rounded multiply each), so every partial and the
    merged total are order-free integer arithmetic; the final
    cov = (S_ij - S_i*S_j/n)/n runs in fixed-order double on exact
    integers. The ORACLE (an unnest-pair SQL over every element — the
    form this operator exists to avoid at scale) reproduces the same
    lattice bit-for-bit. in_dim is a validated CONTRACT (a mismatched
    batch fails loudly instead of silently producing a differently
    shaped matrix)."""

    def partial_gram(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if x.shape[1] != in_dim:
                raise ValueError(
                    f"expected {in_dim}-dim vectors, got {x.shape[1]}"
                )
            iu, ju = np.triu_indices(x.shape[1])
            # pinned pair products, THEN the partition sum (int64)
            prods = np.floor(
                x[:, iu] * x[:, ju] * 1_000_000.0 + 0.5
            ).astype(np.int64)
            s2 = prods.sum(axis=0)
            firsts = np.floor(x * 1_000_000.0 + 0.5).astype(np.int64).sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(x.shape[1])]),
                    "j": np.concatenate([ju, np.full(x.shape[1], -1)]),
                    "s": np.concatenate([s2, firsts]),
                    "n": np.concatenate(
                        [
                            np.full(len(iu), len(pdf), dtype=np.int64),
                            np.full(x.shape[1], 0, dtype=np.int64),
                        ]
                    ),
                }
            )

    parts = emb.select(vec_col).mapInPandas(
        partial_gram, schema="i int, j int, s long, n long"
    )
    merged = parts.groupBy("i", "j").agg(
        F.sum("s").alias("_s"), F.sum("n").alias("_n")
    )
    firsts = merged.filter(F.col("j") == -1).select(
        F.col("i"), F.col("_s").alias("_fs")
    )
    second = merged.filter(F.col("j") >= 0)
    fi = firsts.select(F.col("i"), F.col("_fs").alias("_fi"))
    fj = firsts.select(F.col("i").alias("j"), F.col("_fs").alias("_fj"))
    # S2 is in micro^1 units of x_i*x_j (one 1e6 pin on the product);
    # first moments are micro of x. cov = E[xy] - E[x]E[y]:
    #   E[xy] = S2/n/1e6 ; E[x]E[y] = (Fi/n/1e6)*(Fj/n/1e6)
    n_d = F.col("_n").cast("double")
    exy = F.col("_s").cast("double") / n_d / 1e6
    ex = F.col("_fi").cast("double") / n_d / 1e6
    ey = F.col("_fj").cast("double") / n_d / 1e6
    return (
        second.join(F.broadcast(fi), "i")
        .join(F.broadcast(fj), "j")
        .select(
            F.col("i"),
            F.col("j"),
            round_half_up(exy - ex * ey, 6).alias("cov"),
        )
    )


def save_ivf_index(
    candidates: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    centroids: str = "deterministic",
    cand_id: str = "cand_id",
    cand_vec: str = "cv",
    kmeans_seed: int = 7,
    kmeans_sample_fraction: float = 1.0,
    n_files: int | None = None,
) -> dict:
    """Persist an IVF index as two manifest-committed lake tables — the
    production ANN flow: FIT ONCE (the expensive pass over the corpus),
    SEARCH MANY (each query run reads centroids + only its probed
    cells). `{index_dir}/centroids` holds the n_cells (cent_id, vec)
    rows; `{index_dir}/cells` holds every candidate with its assigned
    cell, written `cluster_by="cell_id"` so each data file covers a tight
    cell range and `read_table(key_between=("cell_id", c, c))` PRUNES to
    the probed cells' files from manifest stats alone — the inverted
    lists realized as data-skipping file layout, exactly how
    Delta/Iceberg-backed vector stores shard IVF lists.

    Centroid fit is the same dial as `ivf_topk` (deterministic = the
    parity path, kmeans = the production path); assignment is the same
    map-side numpy argmin. Snapshot semantics come free from the
    manifest layer: re-fitting commits new versions, old readers keep
    their snapshot, vacuum reclaims.
    """
    from azure_iot_realtime_data_pipeline_spark.sources import acid

    if centroids == "kmeans":
        cent_lits = _kmeans_centroids(
            candidates, cand_vec, n_cells, kmeans_seed, kmeans_sample_fraction
        )
    elif centroids == "deterministic":
        cent_lits = deterministic_centroids(candidates, cand_id, cand_vec, n_cells)
    else:
        raise ValueError(
            f"centroids must be 'deterministic' or 'kmeans', got {centroids!r}"
        )
    import os

    spark = candidates.sparkSession
    cent_df = spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in cent_lits],
        "cent_id int, vec array<double>",
    )
    acid.write_table(cent_df, os.path.join(index_dir, "centroids"))
    assigned = assign_to_centroids(candidates, cent_lits, cand_id, cand_vec)
    # pruning needs files whose cell ranges are NARROWER than the cell
    # domain: pre-size the file count (default ~one file per two cells;
    # a one-file table has nothing to skip). write_table's cluster_by
    # then range-sorts so each file covers a tight contiguous cell span.
    n_out = int(n_files) if n_files else max(2, n_cells // 2)
    stats = acid.write_table(
        assigned.repartition(n_out),
        os.path.join(index_dir, "cells"),
        cluster_by="cell_id",
    )
    return {"n_cells": len(cent_lits), **stats}


def append_to_ivf_index(
    new_candidates: DataFrame,
    index_dir: str,
    cand_id: str = "cand_id",
    cand_vec: str = "cv",
    n_files: int | None = None,
) -> dict:
    """Incremental IVF ingest — the daily-crawl shape: assign ONLY the
    new batch to the index's EXISTING centroids (bounded centroid read
    + the same map-side numpy argmin the fit used — |batch| assignment
    work, zero shuffles) and append the assigned rows to the cells
    table in one layout-preserving commit (`acid.append_table`: every
    existing cell file carries over BY NAME, the batch lands
    cell-clustered so manifest-stats pruning keeps biting). The corpus
    is never re-read, re-assigned, or re-clustered; a periodic
    `acid.optimize` re-tightens cell file ranges across batches, and
    `ivf_topk_from_index` search over the appended index equals the
    in-memory search over the union at the same dials (gated).

    Centroids deliberately do NOT move (the standard production IVF
    contract — FAISS `add` after `train`): drift is handled by a
    re-fit, which the manifest layer versions atomically.
    """
    import os

    from azure_iot_realtime_data_pipeline_spark.sources import acid

    spark = new_candidates.sparkSession
    cent_lits = load_ivf_centroids(spark, index_dir)
    assigned = assign_to_centroids(new_candidates, cent_lits, cand_id, cand_vec)
    stats = acid.append_table(
        assigned, os.path.join(index_dir, "cells"), n_files=n_files
    )
    return {"n_cells": len(cent_lits), **stats}


def load_ivf_centroids(spark, index_dir: str) -> list:
    """The index's centroid literals, [(cent_id, [dims...]), ...] —
    a bounded n_cells-row read off the centroids table's snapshot."""
    import os

    from azure_iot_realtime_data_pipeline_spark.sources import acid

    rows = acid.read_table(
        spark, os.path.join(index_dir, "centroids")
    ).collect()
    return sorted(
        ((int(r["cent_id"]), list(r["vec"])) for r in rows),
        key=lambda t: t[0],
    )


def ivf_topk_from_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    n_probe: int = 4,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "qv",
    cand_id: str = "cand_id",
    cand_vec: str = "cv",
    dup_threshold: float | None = None,
) -> DataFrame:
    """Search a persisted IVF index: load the bounded centroid table,
    compute each query's n_probe nearest cells, read ONLY those cells'
    rows from the cluster_by-cell lake table (manifest-stats file
    pruning — the corpus files outside the probed cells are never
    opened), then run the standard scoring with the SAME pre-fit
    centroids — output identical to `ivf_topk` over the full candidate
    table at the same dials (gated), at probed-cells IO instead of
    corpus IO.

    The probed-cell set is computed driver-side from the collected
    query vectors — queries are the operator's tiny broadcast side by
    contract (ivf_topk already ships them to every task), and the
    arithmetic is the probe fn's exact sequential fold, so the loaded
    candidate set equals the one the in-memory search would score.
    """
    import os

    from azure_iot_realtime_data_pipeline_spark.sources import acid

    cent_lits = load_ivf_centroids(spark, index_dir)
    qrows = [
        r[query_vec]
        for r in queries.select(query_vec).collect()
        if r[query_vec] is not None
    ]
    probed = _probe_cells_driver(qrows, cent_lits, n_probe)
    cells_dir = os.path.join(index_dir, "cells")
    parts = [
        acid.read_table(spark, cells_dir, key_between=("cell_id", c, c))
        for c in probed
    ]
    if not parts:
        loaded = acid.read_table(spark, cells_dir).limit(0)
    else:
        loaded = parts[0]
        for p in parts[1:]:
            loaded = loaded.unionByName(p)
    cands = loaded.select(F.col(cand_id), F.col(cand_vec))
    return ivf_topk(
        queries,
        cands,
        n_cells=len(cent_lits),
        n_probe=n_probe,
        k=k,
        query_id=query_id,
        cand_id=cand_id,
        query_vec=query_vec,
        cand_vec=cand_vec,
        centroids=cent_lits,
        dup_threshold=dup_threshold,
    )


def _probe_cells_driver(
    qvecs: list, cent_lits: list, n_probe: int
) -> list:
    """Union of every query's n_probe nearest cells, computed in plain
    python with the probe fn's EXACT arithmetic (sequential f64 fold in
    ascending dim order, floor-rounded cosine, ties (cos DESC, cid ASC))
    so the persisted search reads precisely the cells the in-memory
    search would score. Bounded by n_cells regardless of query count."""
    import math

    cents = []
    for cid, cvec in cent_lits:
        acc = 0.0
        for x in cvec:
            acc += x * x
        cents.append((cid, cvec, math.sqrt(acc)))
    probed: set = set()
    for vec in qvecs:
        nrm_acc = 0.0
        for x in vec:
            nrm_acc += x * x
        nrm = math.sqrt(nrm_acc)
        if nrm <= 0.0:
            continue
        scored = []
        for cid, c, cn in cents:
            acc = 0.0
            for vk, ck in zip(vec, c):
                acc += vk * ck
            cos = math.floor((acc / (nrm * cn)) * 10000.0 + 0.5) / 10000.0
            scored.append((cid, cos))
        scored.sort(key=lambda t: (-t[1], t[0]))
        probed.update(cid for cid, _ in scored[:n_probe])
    return sorted(probed)


# ---------------------------------------------------------------------------
# Product quantization (the FAISS PQ recipe): m-subspace codebooks,
# byte codes per subspace, asymmetric-distance (ADC) scoring
# ---------------------------------------------------------------------------


def pq_codebooks(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    m_subspaces: int,
    n_codes: int,
) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace codebooks as literal tables: the `n_codes`
    lowest-id candidate vectors sliced into `m_subspaces` equal chunks
    (the deterministic dial — exactly reproducible and SQL-oracle-able,
    the same philosophy as `deterministic_centroids`; a per-subspace
    k-means fit drops in above the unchanged encode/score math).
    Returns codebooks[m] = [(code_id, subvector), ...] sorted by id."""
    cents = deterministic_centroids(candidates, id_col, vec_col, n_codes)
    if not cents:
        return [[] for _ in range(m_subspaces)]
    d = len(cents[0][1])
    if d % m_subspaces != 0:
        raise ValueError(
            f"vector dim {d} not divisible by m_subspaces={m_subspaces}"
        )
    w = d // m_subspaces
    return [
        [(cid, vec[m * w : (m + 1) * w]) for cid, vec in cents]
        for m in range(m_subspaces)
    ]


def pq_encode(
    candidates: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "cand_id",
    vec_col: str = "cv",
) -> DataFrame:
    """PQ encode: each vector becomes `m` small code ids (the nearest
    codeword per subspace by ROUNDED squared L2, ties to the lowest
    code id — 4-dp rounding + sequential-over-dims accumulation make
    the argmin engine-portable) plus the reconstruction norm in int64
    micro-units (sum of the chosen codewords' squared norms — what ADC
    cosine divides by). 64x compression at m=8 over float64 dims=64,
    one narrow Arrow map, zero shuffle — the corpus side of `pq_topk`
    and the storage format a 100 TB vector lake keeps hot."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    m_sub = len(codebooks)
    id_type = candidates.schema[id_col].dataType

    def fn(batches):
        import numpy as np
        import pandas as pd

        books = []
        for book in codebooks:
            ws = [np.asarray(wv, dtype=np.float64) for _cid, wv in book]
            ids = [cid for cid, _wv in book]
            w2_micro = []
            for wvec in ws:
                acc = 0.0
                for x in wvec:
                    acc += x * x
                w2_micro.append(int(np.floor(acc * 1e6 + 0.5)))
            books.append((ids, ws, w2_micro))
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n, d = v.shape
            w = d // m_sub
            codes = np.zeros((n, m_sub), dtype=np.int64)
            rnorm2 = np.zeros(n, dtype=np.int64)
            for m, (ids, ws, w2m) in enumerate(books):
                sub = v[:, m * w : (m + 1) * w]
                best = np.full(n, np.inf)
                bid = np.zeros(n, dtype=np.int64)
                bw2 = np.zeros(n, dtype=np.int64)
                for j, wvec in enumerate(ws):
                    acc = np.zeros(n)
                    for k in range(w):
                        diff = sub[:, k] - wvec[k]
                        acc = acc + diff * diff
                    d2 = np.floor(acc * 10000.0 + 0.5) / 10000.0
                    take = d2 < best  # strict <: ties keep the LOWEST id
                    best = np.where(take, d2, best)
                    bid = np.where(take, ids[j], bid)
                    bw2 = np.where(take, w2m[j], bw2)
                codes[:, m] = bid
                rnorm2 = rnorm2 + bw2
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": list(codes),
                    "_rn2_micro": rnorm2,
                }
            )

    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("codes", ArrayType(LongType())),
            StructField("_rn2_micro", LongType()),
        ]
    )
    return candidates.select(id_col, vec_col).mapInPandas(fn, schema)


def pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    m_subspaces: int = 8,
    n_codes: int = 16,
    k: int = 10,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
    rerank_factor: int = 0,
) -> DataFrame:
    """J64b product-quantization ANN (the FAISS PQ flow): encode the
    corpus once to m byte-codes per vector, score queries against the
    CODES by asymmetric distance — each query precomputes its dot with
    every codeword (m * n_codes values, driver-side like the IVF probe
    fn since queries are the tiny broadcast side by contract) and a
    candidate's approximate cosine is the table-lookup sum over its
    codes divided by ||q|| * reconstruction norm. Engine-portable by
    the house pinning: per-subspace dots land on the int64 micro
    lattice BEFORE the order-free sum, the final cosine rounds 4 dp.

    `rerank_factor > 0` adds the FAISS REFINE stage: PQ proposes the
    top `k * rerank_factor` per query by ADC, then ONLY those rows join
    back to the float vectors for an exact-cosine re-rank — the scored
    set is bounded by |Q| * k * factor, so the corpus is still read as
    codes. Measured on the weakly-clustered synthetic corpus (the same
    one that caps hyperplane-LSH recall, BASELINE.md r4): raw ADC at
    m=8/n_codes=16 lands recall@10 ~0.32, refine lifts it to ~0.64 at
    factor 4 and ~0.82 at factor 8 (gated >= 0.7); on clustered
    real-world embeddings the shortlist is far tighter. `cosine` is
    EXACT for the emitted rows when reranking.

    The scale story: corpus IO is m bytes + one int per vector (the
    codes frame), never the float vectors; scoring is O(m) lookups per
    candidate instead of O(d) multiplies. Returns (query_id, cand_id,
    cosine, rank) — without rerank, `cosine` is the ADC approximation
    (recall-gated vs brute force, same contract as
    jl_topk/quantized_topk)."""
    import math as _math

    books = pq_codebooks(candidates, cand_id, cand_vec, m_subspaces, n_codes)
    encoded = pq_encode(candidates, books, cand_id, cand_vec)

    qrows = [
        (r[query_id], list(r[query_vec]))
        for r in queries.select(query_id, query_vec).collect()
        if r[query_vec] is not None
    ]
    qlits = []
    for qid, qv in qrows:
        acc = 0.0
        for x in qv:
            acc += x * x
        qn = _math.sqrt(acc)
        if qn <= 0.0:
            continue
        w = len(qv) // m_subspaces
        table = []
        for m, book in enumerate(books):
            row = {}
            for cid, wvec in book:
                dot = 0.0
                for kk in range(w):
                    dot += qv[m * w + kk] * wvec[kk]
                row[cid] = int(_math.floor(dot * 1e6 + 0.5))
            table.append(row)
        qlits.append((qid, qn, table))

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())
            rn = np.sqrt(pdf["_rn2_micro"].to_numpy() / 1e6)
            out_q, out_c, out_cos = [], [], []
            for qid, qn, table in qlits:
                adc = np.zeros(len(pdf), dtype=np.int64)
                for m in range(codes.shape[1]):
                    lut = table[m]
                    adc = adc + np.vectorize(lut.__getitem__)(codes[:, m])
                denom = qn * rn
                ok = denom > 0.0
                # zero-denominator rows emit NaN and are filtered below
                # (the SQL twin drops them; a -inf sentinel would rank)
                cos = np.where(
                    ok,
                    np.floor((adc / 1e6) / np.where(ok, denom, 1.0) * 10000.0 + 0.5)
                    / 10000.0,
                    np.nan,
                )
                out_q.extend([qid] * len(pdf))
                out_c.extend(pdf[cand_id].to_numpy())
                out_cos.extend(cos)
            yield pd.DataFrame(
                {query_id: out_q, cand_id: out_c, "cosine": out_cos}
            )

    qid_type = queries.schema[query_id].dataType
    cid_type = candidates.schema[cand_id].dataType
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [
            StructField(query_id, qid_type),
            StructField(cand_id, cid_type),
            StructField("cosine", DoubleType()),
        ]
    )
    scored = encoded.mapInPandas(fn, schema).filter(
        (F.col(query_id) != F.col(cand_id))  # the family's self-match rule
        & ~F.isnan("cosine")
    )
    if rerank_factor <= 0:
        return _rank_topk(scored, k, query_id, cand_id)
    # REFINE: exact cosine over the bounded ADC shortlist only — the
    # float vectors are read for |Q| * k * factor rows, never the corpus
    shortlist = _rank_topk(
        scored, k * int(rerank_factor), query_id, cand_id
    ).select(query_id, cand_id)
    q = queries.select(
        query_id, query_vec, norm_f64(F.col(query_vec)).alias("_qn")
    )
    c = candidates.select(
        cand_id, cand_vec, norm_f64(F.col(cand_vec)).alias("_cn")
    )
    exact = (
        shortlist.join(F.broadcast(q), query_id)
        .join(c.hint("shuffle_hash"), cand_id)
        .select(
            query_id,
            cand_id,
            round_half_up(
                dot_f64(F.col(query_vec), F.col(cand_vec))
                / (F.col("_qn") * F.col("_cn"))
            ).alias("cosine"),
        )
    )
    return _rank_topk(exact, k, query_id, cand_id)
