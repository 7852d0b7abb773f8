"""Storage-maintenance utilities: small-file compaction and partition
retention — the two jobs every continuously-written lake layout needs
(reference analog: the ADLS bronze archive the A3 sink appends to,
terraform/main-example.tf:60-71, accumulates one file per micro-batch
forever; Azure leaves compaction/retention to the user, so a standalone
engine must ship them).

Scale notes:
- Compaction reads once and writes once at a chosen output-file count —
  coalesce (narrow, no shuffle) when shrinking, repartition only when
  asked to grow. The swap is write-to-temp + atomic directory rename,
  so readers never observe a half-compacted table; the temp lives
  beside the target (same filesystem) for rename atomicity.
- Partition expiry is pure directory manipulation on the Hive-style
  layout `write_date_partitioned` produces — no Spark job at all; at
  100 TB deleting history must not cost a scan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_files: int,
) -> int:
    """Rewrite a parquet directory into `target_files` files (per
    partition directory none — this is for UNpartitioned sink output;
    expire/compact partitioned layouts per-partition). Returns the
    number of data files after compaction.

    Shrinking uses `coalesce` (narrow, no shuffle); a target ABOVE the
    current partition count uses `repartition` (coalesce cannot grow).

    Swap protocol: readers never see a MIX of old and new files, but
    POSIX has no atomic directory exchange, so there is a brief window
    between the two renames where `path` is absent (a concurrent read
    raises path-not-found and should retry). Crash recovery is
    self-healing and idempotent: a stale `._compact_tmp` is rebuilt; a
    stale `._compact_old` with `path` present is a completed swap's
    leftover (removed); `._compact_old` WITHOUT `path` means the crash
    hit between the renames — the original is restored before
    compacting again.
    """
    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)       # previous run finished; leftover
        else:
            os.rename(old, path)     # crashed mid-swap; restore
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    df: DataFrame = spark.read.parquet(path)
    if target_files > df.rdd.getNumPartitions():
        df = df.repartition(target_files)
    else:
        df = df.coalesce(target_files)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )


def expire_partitions(
    path: str,
    older_than: str,
    partition_col: str = "event_date",
) -> list[str]:
    """Delete Hive-style partition directories with partition value
    strictly below `older_than` (ISO date string compares
    lexicographically = chronologically). Returns the partition values
    removed. Directory-level retention: no scan, no Spark job —
    the layout IS the index."""
    removed: list[str] = []
    prefix = partition_col + "="
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(prefix):
            continue
        value = entry[len(prefix):]
        if value < older_than:
            shutil.rmtree(os.path.join(path, entry))
            removed.append(value)
    return removed


def lake_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Lake file-layout report — the input to the compaction decision
    `compact_parquet_dir` acts on: per data file its on-disk size and
    row count, plus the small-file flag (< 16 MiB, the classic
    too-many-tiny-files smell on an append-forever bronze layout).

    Two metadata-scale passes, no full data scan: file sizes come from
    a driver-side recursive filesystem listing (pure namenode/inode
    metadata — the same cost class as `expire_partitions`), row counts
    from ONE Spark job over the parquet FOOTERS (count() on a parquet
    scan reads metadata only, grouped by `input_file_name`). Returns
    (file, bytes, n_rows, is_small) ordered data.
    """
    import os

    from pyspark.sql import functions as F

    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                sizes.append((full, os.path.getsize(full)))
    size_df = spark.createDataFrame(sizes, "file string, bytes long")
    counts = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("_uri"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            # input_file_name yields a URL-ENCODED file:///abs/path URI
            # (spaces -> %20, %% -> %25), so strip the scheme+authority
            # then percent-decode or the equi-join against the os.walk
            # listing silently misses those files (n_rows=0). url_decode
            # is form-decoding ('+' -> space), but Hadoop's Path.toUri
            # never encodes a space as '+', so any literal '+' in the
            # URI is a real '+' — pre-escape it to %2B first.
            F.url_decode(
                F.regexp_replace(
                    F.regexp_replace(F.col("_uri"), "^file://", ""),
                    "\\+",
                    "%2B",
                )
            ).alias("file"),
            "n_rows",
        )
    )
    return size_df.join(counts, "file", "left").select(
        "file",
        "bytes",
        F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        (F.col("bytes") < 16 * 1024 * 1024).alias("is_small"),
    )
