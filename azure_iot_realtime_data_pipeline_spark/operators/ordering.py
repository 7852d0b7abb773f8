"""Distributed global ordering / surrogate-key assignment (H2 hard part).

The reference's Telemetry table has a `BIGINT IDENTITY` key
(reference README.MD:169). Spark has no identity column, and the naive
translation — `row_number() OVER (ORDER BY ...)` with no partition — is
a single-task global sort: the whole dataset flows through one window
partition, the canonical 100 TB cliff.

`global_row_number` is the scale-correct construction (the same idea as
RDD.zipWithIndex, expressed on DataFrames):

1. `repartitionByRange(order_cols)` — range shuffle, ~even partitions,
   every key of partition i sorts before every key of partition i+1;
2. `sortWithinPartitions` — parallel local sorts (no global merge);
3. a zero-shuffle `mapInPandas` stamps a contiguous local index per
   partition (Arrow batches, order-preserving);
4. per-partition counts (tiny: one row per partition) prefix-sum into
   offsets on the driver — O(num_partitions), not O(rows) — and join
   back as a broadcast.

Result: bit-identical to the naive window (same oracle), but every
stage is parallel and the only driver data is one count per partition.
Non-contiguous alternative when ordering doesn't matter at all:
`monotonically_increasing_id()` (zero shuffles, zero coordination).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous 1-based global row numbers in (order_cols) order,
    computed without a single-task sort. Ordering keys must be unique
    for a deterministic result (pass a tiebreaker column)."""
    cols = [F.col(c).asc() for c in order_cols]
    part = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    ).sortWithinPartitions(*cols)

    with_pid = part.withColumn("_pid", F.spark_partition_id())
    # fresh StructType: StructType.add mutates in place, which would
    # corrupt the DataFrame's cached schema
    out_schema = StructType(
        list(with_pid.schema.fields) + [StructField("_local", LongType())]
    )

    def stamp_local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_local"] = range(i, i + len(pdf))
            i += len(pdf)
            yield pdf

    indexed = with_pid.mapInPandas(stamp_local, out_schema)
    # checkpoint-free determinism: the local index depends only on the
    # partition's sorted content, so recomputation is stable
    counts = indexed.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_n"]
    spark = df.sparkSession
    offsets_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid INT, _offset LONG"
    )
    return (
        indexed.join(F.broadcast(offsets_df), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_offset") + 1).cast("long"))
        .drop("_pid", "_local", "_offset")
    )
