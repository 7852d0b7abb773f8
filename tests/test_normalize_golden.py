"""Golden end-to-end test of the ingest path (SURVEY.md §3.1 + §5).

The reference ships one golden input/output pair: the raw device message
(iot-central/raw-data-template.json) and the expected result of its
export transform (iot-central/preview-output-example.json) — same ids
and timestamps, with the documented edge cases (absent sensor values ->
nulls, negative battery int, extreme 2.37e+305 barometer double). The
fixture below reconstructs that pair's data; every assertion value is
the reference's published expected output.

Covers: A2 parse, D1-D6 normalize, closed sensor struct, B9 cast with
nanosecond truncation, C1-C3 magnitudes on null structs, and the G1-G5
serve-row coercions — the full message lifecycle on golden data.
"""

from __future__ import annotations

import json
import math

from azure_iot_realtime_data_pipeline_spark.functions.normalize import (
    curated_telemetry,
    normalize_raw_events,
    parse_raw_device_json,
    powerbi_rows,
    sensor_struct,
)

from pyspark.sql import functions as F

APP_ID = "86c928d2-585e-4e2b-8a6d-ffee8d7e0233"
DEVICE_ID = "hoyp69aa69xt"
TEMPLATE_ID = "dtmi:azureiot:y6bebw2sg"
ENQUEUED = "2009-10-10T00:49:49.432486656Z"
BATTERY = -570335521
BAROMETER = 2.3652105113135073e305

RAW_MESSAGE = {
    "applicationId": APP_ID,
    "enqueuedTime": ENQUEUED,
    "messageSource": "telemetry",
    "component": "sensors",
    "telemetry": [
        {"name": "battery", "value": BATTERY},
        {"name": "accelerometer"},
        {"name": "gyroscope"},
        {"name": "magnetometer"},
        {"name": "barometer", "value": BAROMETER},
        {"name": "geolocation"},
    ],
    "device": {
        "id": DEVICE_ID,
        "name": "solid state panel",
        "templateId": TEMPLATE_ID,
        "templateName": "IoT Plug and Play mobile",
        "simulated": True,
        "approved": True,
        "blocked": False,
        "provisioned": True,
    },
}


def _envelope(spark):
    raw_json = spark.createDataFrame([(json.dumps(RAW_MESSAGE),)], ["value"])
    return normalize_raw_events(parse_raw_device_json(raw_json))


def test_normalize_matches_preview_output(spark):
    row = _envelope(spark).collect()[0].asDict()
    # the 11 fields of preview-output-example.json, field for field
    assert row["schema"] == "default@v1"
    assert row["applicationId"] == APP_ID
    assert row["deviceId"] == DEVICE_ID
    assert row["templateId"] == TEMPLATE_ID
    assert row["messageSource"] == "telemetry"
    assert row["enqueuedTime"] == ENQUEUED  # string passthrough, jq-faithful
    assert row["component"] == "sensors"
    assert row["module"] is None
    assert row["messageProperties"] is None
    assert row["enrichments"] is None
    tel = row["telemetry"]
    assert tel["battery"] == float(BATTERY)
    assert tel["barometer"] == BAROMETER  # extreme double survives exactly
    for absent in ("accelerometer", "gyroscope", "magnetometer", "geolocation"):
        assert absent in tel and tel[absent] is None  # key present, value null


def test_sensor_struct_closes_the_map(spark):
    closed = _envelope(spark).select(
        sensor_struct(F.col("telemetry")).alias("t")
    ).collect()[0]["t"]
    assert closed["battery"] == BATTERY  # exact bigint, not float
    assert closed["barometer"] == BAROMETER
    assert closed["accelerometer"] is None
    assert closed["geolocation"] is None


def test_curated_telemetry_golden(spark):
    row = curated_telemetry(_envelope(spark)).collect()[0].asDict()
    assert row["deviceId"] == DEVICE_ID
    # nanosecond fraction truncates to DATETIME2-compatible microseconds
    assert row["enqueuedTime"].isoformat() == "2009-10-10T00:49:49.432486"
    assert row["battery"] == BATTERY  # fits INT exactly
    assert row["barometer"] == BAROMETER
    for null_col in (
        "latitude",
        "longitude",
        "altitude",
        "AccelMagnitude",
        "GyroMagnitude",
        "MagMagnitude",
    ):
        assert row[null_col] is None, null_col
    assert row["Anomaly"] == 0


def test_curated_filters_null_device_id(spark):
    msg = dict(RAW_MESSAGE, device=dict(RAW_MESSAGE["device"], id=None))
    raw_json = spark.createDataFrame([(json.dumps(msg),)], ["value"])
    env = normalize_raw_events(parse_raw_device_json(raw_json))
    assert curated_telemetry(env).count() == 0  # B7: WHERE deviceId IS NOT NULL


def test_powerbi_rows_golden(spark):
    row = powerbi_rows(curated_telemetry(_envelope(spark))).collect()[0].asDict()
    assert row["deviceId"] == DEVICE_ID
    # yyyy-MM-dd'T'HH:mm:ss.fff'Z' — milliseconds, UTC
    assert row["enqueuedTime"] == "2009-10-10T00:49:49.432Z"
    assert row["battery"] == float(BATTERY)
    assert row["barometer"] == BAROMETER
    # G3: every null numeric coerced to exactly 0.0
    for coerced in (
        "latitude",
        "longitude",
        "altitude",
        "AccelMagnitude",
        "GyroMagnitude",
        "MagMagnitude",
    ):
        assert row[coerced] == 0.0, coerced
    assert row["Anomaly"] == 0.0


def test_magnitude_overflow_policy(spark):
    """SURVEY.md §7 hard part 6: x*x at 2.37e+305 overflows — the
    documented policy is IEEE inf (DuckDB agrees), not an error."""
    msg = dict(
        RAW_MESSAGE,
        telemetry=[{"name": "barometer", "value": BAROMETER}],
    )
    raw_json = spark.createDataFrame([(json.dumps(msg),)], ["value"])
    env = normalize_raw_events(parse_raw_device_json(raw_json))
    sq = env.select(
        (F.col("telemetry").getItem("barometer") * F.col("telemetry").getItem("barometer")).alias("sq")
    ).collect()[0]["sq"]
    assert math.isinf(sq)
