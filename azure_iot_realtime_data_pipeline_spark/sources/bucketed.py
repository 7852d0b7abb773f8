"""Bucketed-table storage for co-located (exchange-free) joins.

The 100 TB join problem in one sentence: a repeated equi-join between
two large tables pays a full shuffle of BOTH sides every query unless
their storage layout already agrees on the partitioning. Spark's answer
is bucketing — `bucketBy(n, key)` at write time hashes rows into a
fixed number of files per key, and a join between two tables bucketed
on the join key with the same bucket count reads co-located buckets and
joins them with ZERO Exchange on either side (the SortMergeJoin's sort
may also vanish with `sortBy`).

This is the storage-layout counterpart of the runtime levers the engine
already ships (broadcast for small dims, selective salting for skew,
AQE for everything else): broadcast dies when both sides are big,
salting reshapes a shuffle but still pays it — bucketing is the only
lever that removes the shuffle ENTIRELY, at the price of fixing the
layout at write time. The fact/dim pattern: bucket the fact table and
its hottest join dimension on the join key once, then every subsequent
join in the warehouse is narrow.

Plan contract (pinned by tests/test_bucketed.py): joining two tables
bucketed on the join key with equal bucket counts produces a plan with
NO Exchange; the same join over plain parquet shuffles both sides.

Bucketed tables require the session catalog (`saveAsTable`) — plain
`parquet(path)` writes do not carry bucket metadata. The default
in-memory catalog + a warehouse dir is sufficient; production swaps in
a Hive/Glue/Unity metastore with zero call-site change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a parquet table bucketed (and optionally sorted)
    on `bucket_key`. `n_buckets` must MATCH between tables meant to
    co-join; pick it once per warehouse (rows-per-bucket at target
    scale, not cluster size — buckets are storage layout, tasks are
    runtime)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_key)
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata rides along, unlike path reads."""
    return spark.table(table)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    partition_col: str = "event_date",
    mode: str = "overwrite",
) -> None:
    """Persist with Hive-style date partitioning (`.../event_date=.../`)
    — the scan-side twin of bucketing: bucketing removes the JOIN
    shuffle, date partitioning removes the SCAN of irrelevant history.
    A time-range predicate then prunes whole directories at plan time
    (plan-gated in tests/test_bucketed.py): on a 100 TB archive the
    difference between reading one day and reading everything. This is
    the layout the A3 bronze archive and the A6 incremental tail assume
    — the tail's `ts > watermark` filter rides the partition column.
    """
    from pyspark.sql import functions as F

    (
        df.withColumn(partition_col, F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    partition_col: str = "event_date",
    cluster_cols: tuple[str, ...] = ("user_id",),
    files_per_partition: int = 1,
    mode: str = "overwrite",
    writer_options: dict | None = None,
) -> None:
    """Date-partitioned write with WITHIN-FILE clustering on
    `cluster_cols` — the third leg of the layout toolkit: bucketing
    kills the join shuffle, date partitioning prunes whole days, and
    clustering makes PARQUET ROW-GROUP STATISTICS selective for
    point/range predicates on the cluster key (a sorted file stores
    narrow, non-overlapping min/max per row group, so a
    `user_id = k` scan skips all but ~one group; unsorted files have
    every group spanning the full key range and statistics prune
    nothing).

    Mechanics: repartition by (partition value, hash of cluster key)
    into `files_per_partition` tasks per day, then
    `sortWithinPartitions` — one shuffle, sorted task-local, no global
    sort; each task writes exactly one file per day directory it owns.
    The row-group monotonicity is gated in tests/test_bucketed.py with
    pyarrow footer inspection.
    """
    from pyspark.sql import functions as F

    date = F.to_date(F.col(ts_col)).alias(partition_col)
    out = df.withColumn(partition_col, date)
    parts = [F.col(partition_col)]
    if files_per_partition > 1:
        out = out.withColumn(
            "_fp",
            F.pmod(
                F.hash(*[F.col(c) for c in cluster_cols]),
                F.lit(files_per_partition),
            ),
        )
        parts.append(F.col("_fp"))
    (
        out.repartition(*parts)
        .sortWithinPartitions(partition_col, *cluster_cols)
        .drop("_fp")
        .write.mode(mode)
        .options(**(writer_options or {}))
        .partitionBy(partition_col)
        .parquet(path)
    )


def zorder_key(c1, c2, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative integer columns
    into one sort key — multi-dimensional clustering for
    `write_clustered`: a lexicographic (a, b) sort makes row-group
    statistics narrow on `a` only (each group spans b's full range);
    sorting by the interleaved key makes BOTH columns' per-row-group
    ranges narrow, so predicates on EITHER dimension skip row groups
    (the public Z-order layout trick Delta/Iceberg OPTIMIZE uses,
    Morton 1966).

    Pure JVM bit expressions (2*bits shift/or terms, constant-folded
    per row — no UDF). Callers normalize each dimension into
    [0, 2^bits) first (rank, bucket id, or offset from a minimum);
    values are masked to `bits` low bits, so overflow wraps rather than
    poisoning the sort.
    """
    from pyspark.sql import functions as F

    a = c1.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = c2.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return key
