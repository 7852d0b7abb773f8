"""Storage maintenance: compaction preserves content and hits the file
target; partition expiry deletes exactly the aged directories."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table
from azure_iot_realtime_data_pipeline_spark.sources.bucketed import (
    write_date_partitioned,
)
from azure_iot_realtime_data_pipeline_spark.sources.maintenance import (
    compact_parquet_dir,
    expire_partitions,
)


def test_compaction_preserves_rows_and_reduces_files(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "many_small")
    # simulate a micro-batch sink: 37 tiny files
    ev.repartition(37).write.parquet(path)
    before_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before_files >= 30
    before = {tuple(r) for r in ev.collect()}
    n_files = compact_parquet_dir(spark, path, target_files=4)
    assert n_files <= 4
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before
    # leftovers cleaned
    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_old")


def test_expire_partitions_deletes_only_aged_dirs(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "dated")
    write_date_partitioned(ev, path)
    parts = sorted(
        e.split("=", 1)[1] for e in os.listdir(path) if e.startswith("event_date=")
    )
    assert len(parts) > 2
    cutoff = parts[len(parts) // 2]
    removed = expire_partitions(path, older_than=cutoff)
    assert removed == [p for p in parts if p < cutoff]
    kept = sorted(
        e.split("=", 1)[1] for e in os.listdir(path) if e.startswith("event_date=")
    )
    assert kept == [p for p in parts if p >= cutoff]
    # surviving data still reads, and only covers surviving dates
    got_dates = {
        str(r["event_date"])
        for r in spark.read.parquet(path).select("event_date").distinct().collect()
    }
    assert got_dates == set(kept)


def test_compaction_recovers_from_mid_swap_crash_and_grows(spark, sf_smoke, tmp_path):
    """Review regressions: (1) a crash between the two renames (path
    absent, ._compact_old present) must self-heal on the next run;
    (2) a completed run's stale ._compact_old must not block retries;
    (3) a target ABOVE the current partition count must actually grow
    the file count (repartition, not coalesce)."""
    import shutil

    ev = load_table(spark, sf_smoke, "events").select("event_id", "value")
    path = str(tmp_path / "crashy")
    ev.coalesce(2).write.parquet(path)
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    # simulate the mid-swap crash state: path renamed away, tmp gone
    os.rename(path, path + "._compact_old")
    n = compact_parquet_dir(spark, path, target_files=8)
    assert n >= 8  # grew from 2 partitions (repartition path)
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before
    # stale OLD beside a live path (post-success crash): must not block
    shutil.copytree(path, path + "._compact_old")
    n2 = compact_parquet_dir(spark, path, target_files=2)
    assert n2 <= 2
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before
    assert not os.path.exists(path + "._compact_old")

def test_lake_file_stats_reports_sizes_and_counts(spark, sf_smoke, tmp_path):
    """lake_file_stats: every parquet data file reports its on-disk
    bytes and footer row count; totals reconcile with the table; tiny
    files carry the small-file flag the compactor keys on."""
    from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table
    from azure_iot_realtime_data_pipeline_spark.sources.bucketed import (
        write_date_partitioned,
    )
    from azure_iot_realtime_data_pipeline_spark.sources.maintenance import (
        lake_file_stats,
    )

    ev = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "lake")
    write_date_partitioned(ev, path)
    stats = lake_file_stats(spark, path).collect()
    assert len(stats) > 1
    assert all(r["bytes"] > 0 for r in stats)
    assert sum(r["n_rows"] for r in stats) == ev.count()
    assert all(r["is_small"] for r in stats)  # smoke files are tiny


def test_lake_file_stats_url_encoded_paths(spark, sf_smoke, tmp_path):
    """ADVICE r5: input_file_name() returns URL-ENCODED URIs, so a
    directory with a space / '%' / '+' must still join against the
    os.walk listing (previously reported n_rows=0 for those files)."""
    from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table
    from azure_iot_realtime_data_pipeline_spark.sources.maintenance import (
        lake_file_stats,
    )

    ev = load_table(spark, sf_smoke, "events").limit(100)
    path = str(tmp_path / "odd dir %x +plus")
    ev.coalesce(1).write.parquet(path)
    stats = lake_file_stats(spark, path).collect()
    assert len(stats) == 1
    assert stats[0]["n_rows"] == 100

