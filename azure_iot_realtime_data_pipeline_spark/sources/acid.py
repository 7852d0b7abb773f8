"""Manifest-committed parquet table: MERGE without delta-spark.

The reference's Devices sink is a keyed UPSERT into SQL with a primary
key (reference iot-stream-analytics-query.sql:53-61; PK DDL
README.MD:159-165). The Spark-native equivalent is Delta's
``MERGE INTO``, but delta-spark has been absent from this environment
every round (pip-verified r3–r7), so the F7 stand-in was an append-only
anti-join (first-write-wins, no updates). This module closes the gap
with a minimal own implementation of the same storage contract:

- A TABLE is a directory of immutable parquet data files plus a
  MANIFEST (``manifest-<version>.json``) naming the member files.
  Readers resolve the highest-version manifest and read exactly those
  files; writers never mutate or delete a listed file, so every reader
  sees a consistent snapshot regardless of concurrent commits.
- COMMIT is one atomic rename (``os.replace``) of the next manifest —
  the same commit primitive Delta/Iceberg use. A crash before the
  rename leaves the previous version fully intact; data files written
  for the failed commit are unreferenced orphans, never read, and
  swept by :func:`vacuum`.
- MERGE (:func:`merge_upsert`: update matched keys, insert new ones)
  rewrites ONLY the data files whose footer key statistics
  ([min, max] per file, read driver-side from parquet metadata — no
  data scan) can contain a matched key: file-granular copy-on-write,
  exactly Delta's data-skipping rewrite. Untouched files carry over
  into the new manifest by name, so merge cost scales with the touched
  fraction, not the table — the property that matters when the
  dimension is TBs and the batch touches one device partition.

Single-writer by design (the streaming ``foreachBatch`` sink is one
writer); multi-writer would need a lock or a conditional rename, the
same escalation Delta's LogStore makes per filesystem.
"""

from __future__ import annotations

import json
import os
from bisect import bisect_left

from pyspark.sql import DataFrame, SparkSession


def _manifest_version(name: str) -> int | None:
    if name.startswith("manifest-") and name.endswith(".json"):
        try:
            return int(name[len("manifest-") : -len(".json")])
        except ValueError:
            return None
    return None


def _current_manifest(table_dir: str) -> tuple[int, list[str]]:
    """(version, relative data-file paths) of the newest committed
    manifest; (0, []) for an empty/new table."""
    best = 0
    best_files: list[str] = []
    if os.path.isdir(table_dir):
        for name in os.listdir(table_dir):
            v = _manifest_version(name)
            if v is not None and v > best:
                with open(os.path.join(table_dir, name)) as f:
                    best, best_files = v, json.load(f)["files"]
    return best, best_files


def read_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Snapshot read: exactly the newest manifest's files."""
    _, files = _current_manifest(table_dir)
    if not files:
        raise FileNotFoundError(f"no committed manifest in {table_dir}")
    return spark.read.parquet(*[os.path.join(table_dir, f) for f in files])


def _commit(table_dir: str, version: int, files: list[str]) -> None:
    """Atomic commit: write manifest aside, then one os.replace —
    readers observe either the old or the new version, never a torn
    file list."""
    tmp = os.path.join(table_dir, f".manifest-{version}.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "files": sorted(files)}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(table_dir, f"manifest-{version}.json"))


def _file_key_range(path: str, key: str):
    """[min, max] of `key` across a parquet file's row groups, from
    footer statistics only. None when stats are absent (forces the
    conservative rewrite)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index(key)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None or st.min < lo else lo
        hi = st.max if hi is None or st.max > hi else hi
    return None if lo is None else (lo, hi)


def _range_hits(keys_sorted: list, lo, hi) -> bool:
    i = bisect_left(keys_sorted, lo)
    return i < len(keys_sorted) and keys_sorted[i] <= hi


def _write_commit_files(df: DataFrame, table_dir: str, version: int) -> list[str]:
    """Write df as the new commit's data files under commit-<version>/
    and return their table-relative paths. The subdir namespaces each
    commit so uncommitted (crashed) writes can never collide with or
    shadow committed files."""
    sub = f"commit-{version:08d}"
    out = os.path.join(table_dir, sub)
    df.write.mode("overwrite").parquet(out)
    return [
        os.path.join(sub, name)
        for name in os.listdir(out)
        if name.endswith(".parquet")
    ]


def write_table(df: DataFrame, table_dir: str) -> dict:
    """Create/replace the table content in one commit (the CTAS path)."""
    os.makedirs(table_dir, exist_ok=True)
    version, _ = _current_manifest(table_dir)
    new_files = _write_commit_files(df, table_dir, version + 1)
    _commit(table_dir, version + 1, new_files)
    return {"version": version + 1, "files_written": len(new_files)}


def merge_upsert(
    updates: DataFrame,
    table_dir: str,
    key: str,
    max_driver_keys: int = 1_000_000,
) -> dict:
    """MERGE: rows of `updates` replace same-key rows (last-write-wins
    WHEN MATCHED ... UPDATE) and insert otherwise. Only data files whose
    footer [min, max] of `key` contains some update key are rewritten.

    The update key set is collected to the driver for the file-skipping
    decision — bounded by `max_driver_keys` (a micro-batch's device set
    is small; a bulk backfill past the bound degrades gracefully to
    "rewrite every stats-overlapping file" using only min/max of the
    updates, never to an error). Returns
    {version, files_rewritten, files_kept, updates_rows}.
    """
    spark = updates.sparkSession
    os.makedirs(table_dir, exist_ok=True)
    version, files = _current_manifest(table_dir)
    updates = updates.dropDuplicates([key])

    key_rows = (
        updates.select(key).distinct().limit(max_driver_keys + 1).collect()
    )
    n_updates = len(key_rows)
    if n_updates == 0:
        return {
            "version": version,
            "files_rewritten": 0,
            "files_kept": len(files),
            "updates_rows": 0,
        }
    exact_keys = n_updates <= max_driver_keys
    keys_sorted = sorted(r[0] for r in key_rows) if exact_keys else None
    if not exact_keys:
        b = updates.agg({key: "min"}).collect()[0][0], updates.agg(
            {key: "max"}
        ).collect()[0][0]

    touched, kept = [], []
    for rel in files:
        rng = _file_key_range(os.path.join(table_dir, rel), key)
        if rng is None:
            touched.append(rel)  # no stats: conservative rewrite
        elif exact_keys:
            (touched if _range_hits(keys_sorted, rng[0], rng[1]) else kept).append(rel)
        else:
            lo, hi = rng
            (touched if not (hi < b[0] or lo > b[1]) else kept).append(rel)

    if touched:
        survivors = spark.read.parquet(
            *[os.path.join(table_dir, f) for f in touched]
        ).join(updates.select(key), key, "left_anti")
        new_content = survivors.unionByName(updates)
    else:
        new_content = updates
    new_files = _write_commit_files(new_content, table_dir, version + 1)
    _commit(table_dir, version + 1, kept + new_files)
    return {
        "version": version + 1,
        "files_rewritten": len(touched),
        "files_kept": len(kept),
        "updates_rows": n_updates,
    }


def vacuum(table_dir: str, keep_versions: int = 1) -> list[str]:
    """Delete data files referenced by NO retained manifest (crash
    orphans and files replaced by newer versions) and manifests older
    than the newest `keep_versions`. Returns deleted paths. Safe by
    construction: the newest manifest's files are always retained, and
    commit subdirs namespace uncommitted writes."""
    version, _ = _current_manifest(table_dir)
    if version == 0:
        return []
    retained_manifests = [
        v
        for v in range(max(1, version - keep_versions + 1), version + 1)
        if os.path.exists(os.path.join(table_dir, f"manifest-{v}.json"))
    ]
    live: set[str] = set()
    for v in retained_manifests:
        with open(os.path.join(table_dir, f"manifest-{v}.json")) as f:
            live.update(json.load(f)["files"])
    deleted = []
    for root, _dirs, names in os.walk(table_dir):
        for name in names:
            full = os.path.join(root, name)
            rel = os.path.relpath(full, table_dir)
            if root == table_dir:
                # table root holds only manifests (and a writer's
                # in-flight .tmp, which vacuum must not touch)
                mv = _manifest_version(name)
                if mv is not None and mv not in retained_manifests:
                    os.remove(full)
                    deleted.append(rel)
            elif rel not in live:
                # inside a commit-* subdir: parquet orphans plus the
                # _SUCCESS/.crc residue Spark writes next to them
                os.remove(full)
                deleted.append(rel)
    # drop empty commit dirs left behind
    for root, dirs, names in list(os.walk(table_dir, topdown=False)):
        if root != table_dir and not dirs and not names:
            os.rmdir(root)
    return deleted
