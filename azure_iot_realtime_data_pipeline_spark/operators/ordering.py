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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_buckets: int | None = None,
) -> DataFrame:
    """Contiguous 1-based global row numbers in (order_cols) order,
    computed without a single-task sort. Ordering keys must be unique
    for a deterministic result (pass a tiebreaker column). The leading
    order column must be numeric or timestamp (it is range-bucketed)."""
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    lead = F.col(order_cols[0]).cast("double")

    probs = [i / n for i in range(1, n)]
    bounds: list[float] = []
    if probs:
        sample = df.select(lead.alias("_k")).where(F.col("_k").isNotNull())
        bounds = sorted(set(sample.stat.approxQuantile("_k", probs, 0.001)))

    if bounds:
        arr = "array({})".format(
            ", ".join(f"cast({repr(b)} as double)" for b in bounds)
        )
        bucket = F.expr(
            f"size(filter({arr}, b -> b < cast({order_cols[0]} as double)))"
        )
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("_bucket", bucket)

    counts = bucketed.groupBy("_bucket").agg(F.count("*").alias("_n")).collect()
    acc = 0
    offsets: dict[int, int] = {}
    for row in sorted(counts, key=lambda r: r["_bucket"]):
        offsets[row["_bucket"]] = acc
        acc += row["_n"]
    offset_map = F.create_map(
        *[F.lit(x) for pair in offsets.items() for x in pair]
    )

    w = Window.partitionBy("_bucket").orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        bucketed.withColumn(
            out_col,
            (F.row_number().over(w) + offset_map[F.col("_bucket")]).cast("long"),
        )
        .drop("_bucket")
    )
