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
