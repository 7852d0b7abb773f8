"""Distributed global ordering / surrogate-key assignment (H2 hard part).

The reference's Telemetry table has a `BIGINT IDENTITY` key
(reference README.MD:169). Spark has no identity column, and the naive
translation — `row_number() OVER (ORDER BY ...)` with no partition — is
a single-task global sort: the whole dataset flows through one window
partition, the canonical 100 TB cliff.

`global_row_number` is the scale-correct construction, and every stage
is deterministic JVM-side Catalyst work (no Python workers, no
dependence on physical partition ids):

1. one cheap pass computes ~`defaultParallelism` approximate quantile
   bounds of the leading order key; the bounds become **literals** in
   the plan, so every later job buckets rows identically — this is
   what makes the multi-job construction safe under AQE, speculative
   execution, and recomputation (a `spark_partition_id()`-based scheme
   is NOT: partition ids can differ between the counting job and the
   numbering job, silently corrupting offsets);
2. `_bucket` = number of bounds below the row's key — a pure,
   order-monotone function of row values (equal keys share a bucket);
3. per-bucket counts (one tiny job, one row per bucket) prefix-sum
   into offsets on the driver — O(buckets), not O(rows) — and are
   embedded as a literal map;
4. `row_number() OVER (PARTITION BY _bucket ORDER BY order_cols)` +
   offset: a hash shuffle on `_bucket` followed by parallel
   per-bucket sorts — no global merge, no single-task window.

Result: bit-identical to the naive global window (same oracle), wall
clock bounded by the largest bucket. Heavy ties on the leading key
concentrate in one bucket (quantile bounds can't split equal keys);
pass a higher-cardinality leading key if that's a concern.
Non-contiguous alternative when ordering doesn't matter at all:
`monotonically_increasing_id()` (zero shuffles, zero coordination).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _bucket_search(key: Column, bounds: list[float], lo: int, hi: int) -> Column:
    """Binary-search CASE tree: leftmost i in [lo, hi] with bounds[i] >= key,
    i.e. the count of bounds strictly below key. Pure Column API (no SQL
    text — arbitrary column exprs and non-finite bounds are safe), and a
    row evaluates only the log2(len(bounds)) comparisons on its root-to-
    leaf path, not a linear scan of every bound. NULL keys fail every
    `bound < key` predicate and land in bucket 0, consistent with
    NULLS FIRST ascending sort order."""
    if lo == hi:
        return F.lit(lo)
    mid = (lo + hi) // 2
    return F.when(
        F.lit(bounds[mid]) < key, _bucket_search(key, bounds, mid + 1, hi)
    ).otherwise(_bucket_search(key, bounds, lo, mid))


def _numeric_order_key(df: DataFrame, col: str) -> Column:
    """Order-monotone double key for range bucketing. TIMESTAMP_NTZ has no
    direct double cast (SQLSTATE 42K09); route it through TIMESTAMP first —
    the session-tz reinterpretation is a constant offset, so ordering (all
    the bucketing needs) is preserved, and the same expression feeds both
    the bounds pass and the bucket assignment so they can never disagree."""
    from pyspark.sql.types import TimestampNTZType

    c = F.col(col)
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        c = c.cast("timestamp")
    return c.cast("double")


def _bucket_stats(
    df: DataFrame,
    order_cols: list[str],
    num_buckets: int | None,
    value_col: str | None = None,
):
    """Shared two-phase scaffold for the global-prefix primitives
    (`global_row_number`, `global_cumsum`): ONE quantile-bounds pass on
    the leading key and ONE per-bucket stats pass — per bucket the row
    count plus, when `value_col` is given, the value sum and NON-NULL
    value count (the NULL-safety the prefix sum needs: a bucket whose
    running frame holds only NULLs must inherit the carried total, and
    only a running non-null COUNT can distinguish 'no value yet' — NULL
    result — from a genuine zero). One implementation site so the two
    primitives can never disagree on bucket assignment.

    Returns (bounds, lead_expr, stats) with stats a sorted list of
    (bucket, n_rows, value_sum, n_nonnull)."""
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    lead = _numeric_order_key(df, order_cols[0])

    probs = [i / n for i in range(1, n)]
    bounds: list[float] = []
    cols = [lead.alias("_k")]
    if value_col is not None:
        cols.append(F.col(value_col).alias("_v"))
    keys = df.select(*cols).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if probs:
            sample = keys.where(F.col("_k").isNotNull())
            raw = sample.stat.approxQuantile("_k", probs, 0.001)
            # FINITE bounds only: a NaN bound breaks Python's sorted()
            # invariant (NaN is unordered) and the search-tree
            # monotonicity; an inf bound separates nothing. Dropping
            # them merges the extremes into the edge buckets: NaN keys
            # compare greater than every finite bound (Spark sorts NaN
            # last) -> last bucket; -inf/NULL keys fail every
            # `bound < key` -> bucket 0. Order stays consistent with
            # the window sort either way.
            import math

            bounds = sorted({b for b in raw if math.isfinite(b)})
        key_bucket = (
            _bucket_search(F.col("_k"), bounds, 0, len(bounds))
            if bounds
            else F.lit(0)
        )
        aggs = [F.count("*").alias("_n")]
        if value_col is not None:
            aggs.append(F.sum("_v").alias("_s"))
            aggs.append(F.count("_v").alias("_nn"))
        stats = sorted(
            (
                r["_bucket"],
                r["_n"],
                r["_s"] if value_col is not None else None,
                r["_nn"] if value_col is not None else None,
            )
            for r in keys.groupBy(key_bucket.alias("_bucket"))
            .agg(*aggs)
            .collect()
        )
    finally:
        keys.unpersist()
    return bounds, lead, stats


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_buckets: int | None = None,
) -> DataFrame:
    """Contiguous 1-based global row numbers in (order_cols) order,
    computed without a single-task sort. Ordering keys must be unique
    for a deterministic result (pass a tiebreaker column). The leading
    order column must be numeric or timestamp (it is range-bucketed).

    Scan accounting (the 100 TB bill): the bounds pass and the exact
    per-bucket count pass both need only the leading key column, so they
    share ONE column-pruned scan cached as `_k` (8 bytes/row,
    MEMORY_AND_DISK, released before return); the only full-width pass
    over the data is the numbering job itself.
    """
    bounds, lead, stats = _bucket_stats(df, order_cols, num_buckets)

    acc = 0
    offsets: dict[int, int] = {}
    for b, c, _, _ in stats:
        offsets[b] = acc
        acc += c
    offset_map = F.create_map(
        *[F.lit(x) for pair in offsets.items() for x in pair]
    )

    bucket = _bucket_search(lead, bounds, 0, len(bounds)) if bounds else F.lit(0)
    bucketed = df.withColumn("_bucket", bucket)
    w = Window.partitionBy("_bucket").orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        bucketed.withColumn(
            out_col,
            (F.row_number().over(w) + offset_map[F.col("_bucket")]).cast("long"),
        )
        .drop("_bucket")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    num_buckets: int | None = None,
) -> DataFrame:
    """Distributed global prefix sum in (order_cols) order — the
    running-total primitive (cumulative revenue, Lorenz curves,
    cumulative distribution mass) computed WITHOUT the single-task sort
    the naive `Window.orderBy(...)` plans. Ordering keys must be unique
    (pass a tiebreaker); `value_col` must be an INTEGER column
    (micro-units) — bucket offsets are partial sums, and double partial
    sums would make the result depend on the bucket split.

    Same two-phase shape as `global_row_number` — literally the same
    bucketing code (`_bucket_stats`), so the two primitives can never
    disagree on bucket assignment: approxQuantile range-buckets the
    leading key, ONE small pass collects per-bucket (sum, non-null
    count), the driver prefix-sums those into per-bucket offsets
    (|buckets| numbers), and the within-bucket running sum rides an
    ordered window per bucket. NULL-value semantics match the naive
    window exactly: the running total CARRIES over NULL values (a
    bucket whose frame holds only NULLs inherits its offset), and the
    result is NULL only while the global prefix has seen no non-null
    value at all — that is what the per-bucket non-null counts exist to
    decide. At any scale the driver state is the bucket count, never
    the data.
    """
    bounds, lead, stats = _bucket_stats(
        df, order_cols, num_buckets, value_col=value_col
    )

    acc = 0
    acc_nn = 0
    offsets: dict[int, int] = {}
    nn_offsets: dict[int, int] = {}
    for b, _, sval, nn in stats:
        offsets[b] = acc
        nn_offsets[b] = acc_nn
        acc += int(sval or 0)
        acc_nn += int(nn or 0)
    offset_map = F.create_map(
        *[F.lit(x) for pair in offsets.items() for x in pair]
    )
    nn_map = F.create_map(
        *[F.lit(x) for pair in nn_offsets.items() for x in pair]
    )

    bucket = _bucket_search(lead, bounds, 0, len(bounds)) if bounds else F.lit(0)
    w = (
        Window.partitionBy("_bucket")
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket_sum = F.sum(F.col(value_col)).over(w)
    in_bucket_nn = F.count(F.col(value_col)).over(w)
    running_nn = in_bucket_nn + nn_map[F.col("_bucket")]
    return (
        df.withColumn("_bucket", bucket)
        .withColumn(
            out_col,
            F.when(
                running_nn > 0,
                (
                    F.coalesce(in_bucket_sum, F.lit(0))
                    + offset_map[F.col("_bucket")]
                ).cast("long"),
            ),
        )
        .drop("_bucket")
    )


def global_rank_and_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    rank_col: str = "rn",
    sum_col: str = "running_sum",
    num_buckets: int | None = None,
) -> DataFrame:
    """Fused `global_row_number` + `global_cumsum` over the SAME
    ordering (r13): consumers that need both (Lorenz curves: rank for
    pop_share, running sum for value_share) previously ran the
    two-phase scaffold TWICE — two quantile passes, two bucket-stats
    collects, two window sorts. One `_bucket_stats(value_col)` pass
    already carries everything both primitives need (per-bucket row
    count, value sum, non-null count), and the two window expressions
    share one partition+order spec, so Catalyst plans a single Window
    sort. Values are bit-identical to running the two primitives in
    sequence: rank and running sum are functions of the global order
    alone — bucket boundaries cancel out of both (the same invariant
    the individual primitives' oracles already pin)."""
    bounds, lead, stats = _bucket_stats(
        df, order_cols, num_buckets, value_col=value_col
    )

    acc_c = 0
    acc_s = 0
    acc_nn = 0
    c_off: dict[int, int] = {}
    s_off: dict[int, int] = {}
    nn_off: dict[int, int] = {}
    for b, c, sval, nn in stats:
        c_off[b] = acc_c
        s_off[b] = acc_s
        nn_off[b] = acc_nn
        acc_c += c
        acc_s += int(sval or 0)
        acc_nn += int(nn or 0)
    c_map = F.create_map(*[F.lit(x) for pair in c_off.items() for x in pair])
    s_map = F.create_map(*[F.lit(x) for pair in s_off.items() for x in pair])
    nn_map = F.create_map(*[F.lit(x) for pair in nn_off.items() for x in pair])

    bucket = _bucket_search(lead, bounds, 0, len(bounds)) if bounds else F.lit(0)
    order = [F.col(c).asc() for c in order_cols]
    w_rank = Window.partitionBy("_bucket").orderBy(*order)
    w_sum = (
        Window.partitionBy("_bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket_sum = F.sum(F.col(value_col)).over(w_sum)
    in_bucket_nn = F.count(F.col(value_col)).over(w_sum)
    running_nn = in_bucket_nn + nn_map[F.col("_bucket")]
    return (
        df.withColumn("_bucket", bucket)
        .withColumn(
            rank_col,
            (F.row_number().over(w_rank) + c_map[F.col("_bucket")]).cast("long"),
        )
        .withColumn(
            sum_col,
            F.when(
                running_nn > 0,
                (
                    F.coalesce(in_bucket_sum, F.lit(0))
                    + s_map[F.col("_bucket")]
                ).cast("long"),
            ),
        )
        .drop("_bucket")
    )
