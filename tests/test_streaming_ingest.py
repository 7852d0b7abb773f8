"""Streaming binding of the ingest path (SURVEY.md §3.1): raw device
JSON text -> explicit-schema parse (A2) -> jq-faithful normalize (D1-D6)
-> curated telemetry (B-/C-series) — the same library functions the
batch golden test drives, bound to readStream."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.functions.normalize import (
    curated_telemetry,
    normalize_raw_events,
    parse_raw_device_json,
)
from tests.test_normalize_golden import BAROMETER, BATTERY, DEVICE_ID, RAW_MESSAGE


def _write_raw_stream(tmp_path, n_msgs: int = 12) -> str:
    src = tmp_path / "raw"
    src.mkdir()
    for f in range(3):
        lines = []
        for i in range(n_msgs // 3):
            k = f * (n_msgs // 3) + i
            msg = dict(
                RAW_MESSAGE,
                enqueuedTime=f"2009-10-10T00:{50 + k // 60:02d}:{k % 60:02d}.000000000Z",
                device=dict(RAW_MESSAGE["device"], id=f"dev-{k % 4}"),
            )
            lines.append(json.dumps(msg))
        (src / f"part-{f}.json").write_text("\n".join(lines))
    return str(src)


def test_streaming_ingest_end_to_end(spark, tmp_path):
    src = _write_raw_stream(tmp_path)
    raw = spark.readStream.format("text").load(src)
    curated = curated_telemetry(
        normalize_raw_events(parse_raw_device_json(raw, json_col="value"))
    )
    rows = []

    q = (
        curated.writeStream.foreachBatch(lambda b, _id: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert len(rows) == 12
    assert {r["deviceId"] for r in rows} == {"dev-0", "dev-1", "dev-2", "dev-3"}
    one = rows[0]
    assert one["battery"] == BATTERY
    assert one["barometer"] == BAROMETER
    assert one["Anomaly"] == 0
    assert one["AccelMagnitude"] is None  # null sensor structs propagate


def test_streaming_ingest_drops_null_device(spark, tmp_path):
    src = tmp_path / "raw2"
    src.mkdir()
    good = dict(RAW_MESSAGE)
    bad = dict(RAW_MESSAGE, device=dict(RAW_MESSAGE["device"], id=None))
    (src / "p.json").write_text(json.dumps(good) + "\n" + json.dumps(bad))
    raw = spark.readStream.format("text").load(str(src))
    curated = curated_telemetry(
        normalize_raw_events(parse_raw_device_json(raw, json_col="value"))
    )
    rows = []
    q = (
        curated.writeStream.foreachBatch(lambda b, _id: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(rows) == 1
    assert rows[0]["deviceId"] == DEVICE_ID


def test_event_payload_parser_roundtrips_and_quarantines(spark, sf_smoke):
    """A1 broker binding, parser half (broker-less by design): events
    serialized exactly as the wire carries them (JSON bytes in a
    `value` column, broker meta alongside) parse back to the replay
    source's typed schema BIT-EQUAL, malformed payloads surface as
    all-NULL rows (the A2b quarantine contract), and include_meta keeps
    broker provenance columns."""
    from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table
    from azure_iot_realtime_data_pipeline_spark.streaming.source import (
        parse_event_payloads,
    )

    from azure_iot_realtime_data_pipeline_spark.streaming.source import (
        EVENTS_WIRE_TS_FORMAT,
    )

    ev = load_table(spark, sf_smoke, "events").limit(200)
    wire = ev.select(
        F.to_json(
            F.struct(*ev.columns),
            {"timestampFormat": EVENTS_WIRE_TS_FORMAT},
        ).cast("binary").alias("value"),
        F.lit("iot-telemetry").alias("topic"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )
    back = parse_event_payloads(wire)
    assert back.columns == ev.columns
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in ev.schema.fields
    ]
    want = {tuple(r) for r in ev.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want
    # provenance columns ride along when asked
    meta = parse_event_payloads(wire, include_meta=True)
    assert {"topic", "partition", "offset", "timestamp"} <= set(meta.columns)
    # malformed payload -> all-NULL event columns (quarantine-able), not a crash
    junk = spark.createDataFrame(
        [("{not json",), ("42",)], "value string"
    )
    rows = parse_event_payloads(junk).collect()
    assert len(rows) == 2
    assert all(all(v is None for v in r) for r in rows)


def test_kafka_binding_raises_actionable_error_without_connector(spark):
    """A1 broker binding, gate half: this sandbox has no
    spark-sql-kafka jar, so construction must fail with the package
    name and the broker-less alternative — never a bare py4j trace.
    (With the jar present the same call returns the typed stream; the
    parser half above pins those semantics.)"""
    import pytest

    from azure_iot_realtime_data_pipeline_spark.streaming.source import (
        eventhubs_events_stream,
        kafka_events_stream,
    )

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_events_stream(spark, "broker:9092", "iot-telemetry")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        eventhubs_events_stream(
            spark, "ns", "iot-telemetry", "Endpoint=sb://..."
        )
