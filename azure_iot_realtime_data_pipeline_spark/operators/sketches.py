"""Cardinality sketches for corpus-scale profiling.

A 100 TB pipeline constantly asks "how many distinct X per Y"
(users per event type, domains per language, shingles per shard) where
an exact COUNT(DISTINCT) shuffles every distinct value. The KMV
(k-minimum-values) sketch answers with bounded per-group state: keep
only the k smallest hash values of the distinct set; the k-th smallest
of n uniform hashes sits near k/(n+1) of the hash space, so
n_hat = (k-1) / U_(k) estimates the cardinality (Bar-Yossef et al.,
RANDOM'02 — the classic distinct-elements sketch; standard error
~ 1/sqrt(k-2)).

Engine-portability is the design driver here (same policy as the
portable MinHash/SimHash twins in dedup.py): the hash is the md5-derived
`portable_hash32`, every arithmetic step is integer-exact until one
final f64 division, and the estimator is therefore a DETERMINISTIC
function any SQL engine reproduces bit-for-bit — unlike
`approx_count_distinct` (HLL++), whose sketch layout is Spark-internal
and can never hash-match another engine. Spark's native HLL remains the
right choice when only Spark reads the sketch; this operator is the
cross-engine-auditable form.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.functions.rounding import round_half_up
from azure_iot_realtime_data_pipeline_spark.operators.dedup import portable_hash32


def _make_partition_cap_fn(group: str, k: int):
    """mapInPandas body: per input PARTITION, keep only the k smallest
    DISTINCT hashes per group (picklable closure, Arrow-batched).

    This is the map-side partial combine of the KMV merge rule — union
    hash sets, re-take the k smallest — realized per partition before
    any shuffle. State while folding a partition is bounded by
    (groups-in-partition x k) + one incoming batch; the emitted rows
    per partition are at most groups x k.
    """

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        state = None
        for pdf in batches:
            state = pdf if state is None else pd.concat(
                [state, pdf], ignore_index=True
            )
            state = (
                state.drop_duplicates()
                .sort_values([group, "_h"], kind="stable")
                # dropna=False: a NULL group is a real group in Spark's
                # groupBy — pandas' default would silently drop it
                .groupby(group, sort=False, dropna=False)
                .head(k)
            )
        if state is not None and len(state):
            yield state

    return fn


def kmv_distinct(
    df: DataFrame,
    group: str,
    id_col: str,
    k: int = 64,
    out: str = "distinct_est",
) -> DataFrame:
    """(group, n_kept, distinct_est): KMV distinct-count estimate of
    `id_col` per `group`.

    Shape: hash -> MAP-SIDE per-partition cap to the k smallest distinct
    hashes per group (Arrow `mapInPandas`, narrow — no shuffle) -> one
    bounded groupBy that merges the per-partition sketches
    (`array_sort(collect_set(...))` sliced to k) -> one tiny row per
    group. Groups with fewer than k distinct hashes report the EXACT
    count (every partition kept its full distinct set, so the merged
    set is the whole thing); larger groups report
    (k-1) * 2^32 / kth_min_hash, rounded half-up to 4 dp so the one f64
    division compares exactly across engines.

    Scale notes: this is the two-stage k-smallest form — the shuffle
    moves AT MOST k rows per (group, partition) instead of the full
    distinct set, which is the whole point of a sketch at 100 TB (an
    exact COUNT(DISTINCT) shuffles every distinct value; the previous
    form of this operator did too, realizing the k-long bound only
    after the shuffle). Correctness of the cap: the global k smallest
    of a union is contained in the union of per-partition k smallest,
    and a group with < k global distinct values is kept whole by every
    partition. The merge-side `collect_set` partial buffer is bounded
    by the same cap. Re-aggregation (per-day sketches merged to
    per-month) stays cheap: KMV sketches merge by unioning kept-hash
    sets and re-truncating — exactly re-running this operator over
    unioned kept-hash tables. A JVM TypedImperativeAggregate could fuse
    the cap into the aggregate itself; that is a swap point, not a plan
    change — the estimator arithmetic (and the oracle) is identical.
    """
    h = portable_hash32(F.col(id_col).cast("string"))
    # NULL ids are not countable entities — and a NULL hash would sort at
    # different ends in different engines (Spark NULLS FIRST, DuckDB
    # NULLS LAST), silently corrupting the k-th min.
    hashed = df.filter(F.col(id_col).isNotNull()).select(
        F.col(group), h.alias("_h")
    )
    capped = hashed.mapInPandas(_make_partition_cap_fn(group, k), hashed.schema)
    agg = capped.groupBy(group).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_ks")
    )
    n_kept = F.size("_ks")
    est = F.when(
        n_kept < k, n_kept.cast("double")
    ).otherwise(
        round_half_up(
            F.lit(float(k - 1)) * F.lit(2.0**32) / F.element_at("_ks", k)
        )
    )
    return agg.select(
        F.col(group),
        n_kept.cast("long").alias("n_kept"),
        est.alias(out),
    )


def cms_heavy_hitters(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 16,
    threshold: int = 1,
) -> DataFrame:
    """J61 Count-Min-sketch heavy hitters (Cormode & Muthukrishnan,
    J.Algorithms'05): (item, est) for every distinct item whose CMS
    frequency estimate >= threshold.

    The sketch is depth x width int64 counters: row r hashes an item to
    bucket portable_hash32(r || ':' || item) % width and the estimate is
    the MIN over rows of the bucket counts — never an underestimate, so
    heavy hitters have NO false negatives; collisions can only promote
    light items (one-sided error eps ~ e/width with prob 1-e^-depth).
    Like kmv_distinct, the portable md5 hash makes the whole sketch a
    deterministic function any SQL engine reproduces bit-for-bit —
    Spark's native count_min_sketch() aggregate emits an opaque binary
    only Spark can read; this is the cross-engine-auditable form.

    Plan shape (the 100 TB story): build = ONE map-side explode of the
    depth row-hashes per item occurrence into a groupBy over at most
    depth*width keys — partial aggregation collapses each task's stream
    to <= depth*width partial rows before the exchange, so the shuffle
    is sketch-sized, not data-sized (gated). Query = distinct candidate
    items (the one data-sized shuffle — at 100 TB feed candidates from
    a per-partition top-k instead) joined to the BROADCAST sketch,
    min over rows. `threshold` is a caller literal, not a derived
    scalar — no driver round-trip.
    """
    d, w = int(depth), int(width)
    stream = items.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull()
    )
    sketch = cms_sketch(stream, depth=d, width=w)
    cand = stream.distinct()
    est = (
        _cms_bucketed(cand, d, w)
        .join(F.broadcast(sketch), ["_r", "_bucket"])
        .groupBy("item")
        .agg(F.min("_c").alias("est"))
    )
    return est.filter(F.col("est") >= int(threshold))


def _cms_bucketed(items: DataFrame, depth: int, width: int) -> DataFrame:
    """(item, _r, _bucket) — each item row fanned out to its `depth`
    row-hash buckets. Map-side only; shared by the batch build, the
    query side, and the streaming twin so the hash can never drift."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("_r")
    bucket = (
        portable_hash32(
            F.concat_ws(":", F.col("_r").cast("string"), F.col("item"))
        )
        % int(width)
    ).alias("_bucket")
    return items.select("item", rows).select("item", "_r", bucket)


def cms_sketch(
    items: DataFrame, item_col: str = "item", depth: int = 4, width: int = 16
) -> DataFrame:
    """The depth x width counter table (_r, _bucket, _c) itself — the
    mergeable form: sketches of two corpora (or of successive
    micro-batches) combine by summing counters per (_r, _bucket), which
    is exactly why the streaming twin can maintain it with Spark's
    built-in incremental aggregation (windows_stream.cms_sketch_stream).
    Works on both batch and streaming inputs (pure map-side fan-out +
    groupBy over <= depth*width keys)."""
    stream = items.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull()
    )
    return (
        _cms_bucketed(stream, int(depth), int(width))
        .groupBy("_r", "_bucket")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
