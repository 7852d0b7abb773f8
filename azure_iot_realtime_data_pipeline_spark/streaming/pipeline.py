"""Streaming pipeline topology: watermark + single-pass multi-sink fan-out.

Reference semantics reproduced here:
- F3 event-time policy — `withWatermark(60s)` stands in for ASA's
  30 s reorder buffer + 60 s late tolerance
  (reference terraform/main-example.tf:133-136). Spark's built-in
  watermark DROPS rows later than it; ASA's `Adjust` policy CLAMPS
  their timestamps instead — that gap is closed by
  `streaming/windows_stream.py::adjust_clamp_stream` (stateful clamp,
  batch-equivalent to `operators/eventtime.py::adjust_clamp`).
- F4 multi-sink fan-out — ONE input stream feeds three sinks (bronze
  raw archive, Devices dimension, curated Telemetry) exactly like the
  three `SELECT ... INTO` of the ASA job
  (reference stream-analytics/iot-stream-analytics-query.sql:48-83).
  Spark does NOT share scans across independent streaming queries, so
  the single-pass shape is `foreachBatch` + `persist()`: scan once per
  micro-batch, write three times (SURVEY.md §4).
- F5 trigger cadence — `processingTime="10 seconds"` mirrors the
  worker's timer (reference PushTelemetryFunction.cs:20-23); tests use
  `availableNow` for determinism.
- F7 dimension dedup — the Devices sink upserts first-write-wins per
  deviceId into a PK'd table (reference
  iot-stream-analytics-query.sql:53-61 + README.MD:159-165): batch-local
  dropDuplicates, then an anti-join against already-stored keys. On a
  transactional store this is a Delta/JDBC MERGE; the parquet form keeps
  the same semantics for the local stand.

Scale notes: the per-batch persist is the canonical fan-out idiom; the
dimension anti-join broadcasts the (tiny) new-keys side; bronze/telemetry
appends are partitioned parquet writes with no shuffle.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from azure_iot_realtime_data_pipeline_spark.streaming.anomaly import spike_dip_stream

WATERMARK_DELAY = "60 seconds"
TRIGGER_INTERVAL = "10 seconds"


def curated_stream(
    events: DataFrame,
    watermark_delay: str = WATERMARK_DELAY,
    window_seconds: int = 60,
    history_size: int | None = 85,
) -> DataFrame:
    """events stream -> watermarked, anomaly-scored curated telemetry.

    The streaming analog of the `TelemetryWithAnoms` CTE
    (reference iot-stream-analytics-query.sql:8-46): project, score,
    flag — deviceId derivation matches the batch q_normalize surface.
    """
    scored = spike_dip_stream(
        events.withWatermark("ts", watermark_delay),
        key_col="user_id",
        window_seconds=window_seconds,
        history_size=history_size,
    )
    return scored.select(
        F.col("event_id").alias("telemetryId"),
        F.concat(F.lit("dev-"), F.col("user_id").cast("string")).alias("deviceId"),
        F.col("ts").alias("enqueuedTime"),
        F.col("value"),
        F.col("score").alias("Score"),
        F.col("is_anomaly").alias("Anomaly"),
    ).filter(F.col("deviceId").isNotNull())


def upsert_devices(batch: DataFrame, devices_dir: str) -> None:
    """First-write-wins upsert of device metadata (F7).

    New keys only: batch-local first-value dedup, anti-join against the
    stored dimension, append. The stored side stays small (one row per
    device), so the anti-join broadcasts.
    """
    spark = batch.sparkSession
    devices = (
        batch.select(
            "deviceId",
            F.col("enqueuedTime").alias("firstSeen"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("deviceId").orderBy(F.col("firstSeen").asc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if os.path.isdir(devices_dir) and any(
        f.endswith(".parquet") for f in os.listdir(devices_dir)
    ):
        existing = spark.read.parquet(devices_dir).select("deviceId")
        devices = devices.join(F.broadcast(existing), "deviceId", "left_anti")
    devices.write.mode("append").parquet(devices_dir)


def upsert_devices_merge(batch: DataFrame, devices_table_dir: str) -> dict:
    """F7 with TRUE MERGE semantics — the Delta `WHEN MATCHED UPDATE`
    slot tracked as blocked since r3 (delta-spark absent from the
    image, pip-verified every round): latest-metadata-wins per device
    onto the manifest-committed table (sources/acid.py), whose atomic
    manifest rename is the commit protocol and whose footer-stats file
    skipping makes each micro-batch rewrite only the files its devices
    live in. Mirrors the reference's keyed upsert into the PK'd Devices
    table (reference iot-stream-analytics-query.sql:53-61;
    README.MD:159-165). Idempotent per batch content: re-merging the
    same rows yields the same table (last-write-wins on the same
    values), so foreachBatch retries after a crash are safe."""
    from azure_iot_realtime_data_pipeline_spark.sources.acid import merge_upsert

    devices = (
        batch.select(
            "deviceId",
            F.col("enqueuedTime").alias("lastSeen"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("deviceId").orderBy(F.col("lastSeen").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return merge_upsert(devices, devices_table_dir, key="deviceId")


def _write_batch_scoped(batch: DataFrame, batch_id: int, out_dir: str) -> None:
    """Idempotent parquet append: each micro-batch owns a `batch_id=`
    partition and replay OVERWRITES exactly that partition (dynamic
    partition-overwrite), so a batch replayed after a mid-fan-out crash
    rewrites its own files instead of appending duplicates."""
    (
        batch.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )


def multi_sink_batch_writer(
    bronze_dir: str,
    devices_dir: str,
    telemetry_dir: str,
    devices_mode: str = "anti_join",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: persist once, write three sinks (F4).

    Exactly-once per sink under micro-batch replay: Structured Streaming
    re-runs a batch after a crash between sink writes, so each sink must
    absorb the same (batch_id, rows) twice. Bronze/telemetry do it by
    batch-id-scoped dynamic partition overwrite; the Devices upsert is
    idempotent in both modes. On a transactional store the equivalent
    is Delta `MERGE` / txn-log `txnAppId+txnVersion`.

    `devices_mode` selects the A4/F7 dimension sink:

    - ``"anti_join"`` (default, reference-faithful): first-write-wins
      append to a plain parquet dir — replayed keys are already stored
      and anti-join away. Read with ``spark.read.parquet``.
    - ``"merge"``: TRUE keyed MERGE (WHEN MATCHED UPDATE lastSeen,
      insert new) onto the manifest-committed ACID table
      (:func:`upsert_devices_merge` over ``sources/acid.py``) — the
      Delta-MERGE semantics the reference's PK'd SQL table gets from
      its upsert, with optimistic-concurrency commits and file-skipping
      rewrites. Read with ``acid.read_table``; idempotent under replay
      because re-merging identical rows lands identical values.

    Layout migration note: sinks written by the pre-batch-id layout
    (loose part files at the root) cannot be mixed with the partitioned
    layout — point new streams at fresh sink directories (or move old
    files under a `batch_id=-1/` subdir) before upgrading.
    """
    if devices_mode not in ("anti_join", "merge"):
        raise ValueError(f"unknown devices_mode: {devices_mode!r}")

    def write(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            _write_batch_scoped(batch, batch_id, bronze_dir)  # A3 bronze raw
            if devices_mode == "merge":
                upsert_devices_merge(batch, devices_dir)  # A4/F7 dimension
            else:
                upsert_devices(batch, devices_dir)
            _write_batch_scoped(batch.drop("value"), batch_id, telemetry_dir)  # A5 fact
        finally:
            batch.unpersist()

    return write


def run_multi_sink(
    curated: DataFrame,
    bronze_dir: str,
    devices_dir: str,
    telemetry_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    trigger_interval: str = TRIGGER_INTERVAL,
    devices_mode: str = "anti_join",
) -> StreamingQuery:
    writer = curated.writeStream.foreachBatch(
        multi_sink_batch_writer(
            bronze_dir, devices_dir, telemetry_dir, devices_mode=devices_mode
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
