"""Batch parquet sources for the driver-provided test tables.

The `events` table is the batch analog of the reference's Event Hub
stream (reference stream-analytics/iot-stream-analytics-query.sql:2-5):
event_id / ts / user_id / event_type / value / props(JSON string) play
the roles of a telemetry message's id / enqueuedTime / deviceId /
sensor-name / reading / payload.

Scan-path notes for 100 TB: everything below is a plain
``spark.read.parquet`` so Catalyst's data-source V2 path gives predicate
pushdown, column pruning, and partition pruning for free; callers must
keep filters/selects declarative (no ``collect()`` then filter) so they
reach the scan.
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
#: timestamp type, so we read them as int64 nanos
#: (spark.sql.legacy.parquet.nanosAsLong) and floor to microseconds,
#: exactly how DuckDB coerces TIMESTAMP_NS to its microsecond TIMESTAMP.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Parquet timestamps written WITHOUT isAdjustedToUTC would otherwise
    # infer as TIMESTAMP_NTZ (Spark 4 default), which rejects double casts
    # and diverges from DuckDB's naive-in-UTC reading under our pinned UTC
    # session tz. Reading them as TIMESTAMP keeps one timestamp type
    # end-to-end regardless of which session (ours or the harness's) runs
    # the query.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # integer `div`, not `/`: double division of ~1.7e18 ns loses
            # sub-µs bits and floors the wrong way by 1 µs
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the plan has fewer partitions
    than the cluster's parallelism — a guard for CPU-bound scalar stages
    (tokenize/shingle/hash, decode UDFs) reading few/unsplittable files.

    Local testdata is one single-row-group parquet file per table, so a
    scan is ONE task and a heavy map stage serializes on one core. At
    100 TB the scan has thousands of splits, the condition is false, and
    this is a no-op — the extra shuffle exists only where it buys strict
    speedup. Call it on a narrow projection (id + payload) so the
    shuffle moves the minimum bytes.
    """
    # streaming plans: inputFiles()/rdd are unavailable, and micro-batch
    # parallelism is the source's maxFilesPerTrigger concern, not this
    # guard's — pass through so batch operators built on this helper
    # (bigram_counts, shingle consumers) run unchanged on streams
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # `inputFiles()` probes the analyzed plan only (cheap) and settles
    # the common local case — few files MUST be repartitioned; this
    # side errs only toward an extra narrow-projection shuffle, never
    # toward serializing. CALLER CONTRACT: pass a projection of ONE
    # scan (every call site does) — inputFiles() aggregates across all
    # relations, so a multi-relation plan could count a small dim's
    # files toward the threshold.
    files = df.inputFiles()
    if files and len(files) < target:
        return df.repartition(target)
    # many-files (or non-file) plans: file count is NOT a partition
    # count — Spark bin-packs small files into few scan partitions
    # (openCostInBytes/maxPartitionBytes), so a thousand tiny files can
    # still be a 2-task scan. Confirm with the physical partition probe;
    # it forces planning once per query build, which is the price of
    # never serializing a CPU-bound map stage.
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view (idempotent) and return them."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


_STAGE_ROOT: str | None = None
_STAGE_SEQ = itertools.count()


def _staging_root() -> str:
    """One process-scoped staging root, removed at interpreter exit."""
    global _STAGE_ROOT
    if _STAGE_ROOT is None:
        _STAGE_ROOT = tempfile.mkdtemp(prefix="spark_stage_")
        atexit.register(shutil.rmtree, _STAGE_ROOT, ignore_errors=True)
    return _STAGE_ROOT


def stage_to_parquet(df: DataFrame, prefix: str, spill_dir: str | None = None) -> DataFrame:
    """Materialize a compact intermediate to parquet and read it back.

    For intermediates feeding MULTIPLE consumers (self-joins, an
    aggregate reused by a window and a scalar), Catalyst recomputes the
    full upstream pipeline per consumer; staging cuts that to one
    computation with no session-cache leak (unlike persist()), and it is
    the literal 100 TB pattern — stage the small table, join against the
    staged copy. NOTE: runs the upstream job EAGERLY at call time; the
    caller's returned plan starts at the staged scan.

    Every call writes a UNIQUE prefix-derived subdir under one
    process-scoped root (or under the caller's ``spill_dir``): the
    previous one-mkdtemp-per-call form registered an atexit entry per
    invocation and leaked a staged copy per bench/parity rerun, and two
    stages handed the same ``spill_dir`` silently clobbered each other.
    """
    root = spill_dir if spill_dir is not None else _staging_root()
    path = os.path.join(root, f"{prefix}{next(_STAGE_SEQ)}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
