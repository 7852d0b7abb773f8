"""jq-style normalization of raw device messages (reference operators D1-D6).

The reference runs a 15-line jq-dialect transform inside IoT Central
(reference iot-central/transformation.txt:3-15) that reshapes the raw
device message (iot-central/raw-data-template.json) into the flat wire
envelope (iot-central/preview-output-example.json):

  D1 envelope rebuild, D2 literal `schema: "default@v1"`,
  D3 nested-path extraction (.device.id -> deviceId),
  D4 passthrough fields,
  D5 `.telemetry | map({key: .name, value: .value})`,
  D6 `from_entries` (array<{key,value}> -> keyed object).

Spark-first expression: `F.transform` for the array map,
`F.map_from_entries` for the pivot, then extraction into the *closed*
six-sensor struct (battery, barometer, accelerometer, gyroscope,
magnetometer, geolocation) — a fixed StructType beats MapType here
because the key set is closed and struct fields prune/pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCHEMA_LITERAL = "default@v1"

#: wire-event schema of the normalized envelope
#: (shape of reference iot-central/preview-output-example.json:1-20)
EVENT_WIRE_SCHEMA = (
    "schema STRING, applicationId STRING, deviceId STRING, templateId STRING, "
    "messageSource STRING, enqueuedTime TIMESTAMP, enrichments MAP<STRING,STRING>, "
    "messageProperties MAP<STRING,STRING>, component STRING, module STRING, "
    "telemetry STRUCT<battery: BIGINT, barometer: DOUBLE, "
    "accelerometer: STRUCT<x: DOUBLE, y: DOUBLE, z: DOUBLE>, "
    "gyroscope: STRUCT<x: DOUBLE, y: DOUBLE, z: DOUBLE>, "
    "magnetometer: STRUCT<x: DOUBLE, y: DOUBLE, z: DOUBLE>, "
    "geolocation: STRUCT<lat: DOUBLE, lon: DOUBLE, alt: DOUBLE>>"
)


def telemetry_entries_to_map(telemetry_array: Column) -> Column:
    """D5+D6: array<struct<name,value>> -> map<name,value>.

    `.telemetry | map({key: .name, value: .value}) | from_entries`
    (reference iot-central/transformation.txt:10).
    """
    entries = F.transform(
        telemetry_array,
        lambda e: F.struct(e["name"].alias("key"), e["value"].alias("value")),
    )
    return F.map_from_entries(entries)


def normalize_raw_events(raw: DataFrame) -> DataFrame:
    """D1-D6: raw device message -> flat wire envelope.

    Input shape: FIXTURES.md F1 (`raw-data-template.json`); output shape:
    FIXTURES.md F2 (`preview-output-example.json`). Scalar-sensor values
    land in a map; callers needing the closed sensor struct extract keys.
    """
    tmap = telemetry_entries_to_map(F.col("telemetry"))
    return raw.select(
        F.lit(SCHEMA_LITERAL).alias("schema"),                    # D2
        F.col("applicationId"),                                    # D4
        F.col("device.id").alias("deviceId"),                      # D3
        F.col("device.templateId").alias("templateId"),            # D3
        F.col("messageSource"),                                    # D4
        F.to_timestamp(F.col("enqueuedTime")).alias("enqueuedTime"),
        F.col("component"),                                        # D4
        tmap.alias("telemetry"),                                   # D5+D6
    )
