"""jq-style normalization of raw device messages (reference operators D1-D6)
and the downstream curated/serve projections they feed.

The reference runs a 15-line jq-dialect transform inside IoT Central
(reference iot-central/transformation.txt:3-15) that reshapes the raw
device message (iot-central/raw-data-template.json) into the flat wire
envelope (iot-central/preview-output-example.json):

  D1 envelope rebuild, D2 literal `schema: "default@v1"`,
  D3 nested-path extraction (.device.id -> deviceId),
  D4 passthrough fields (incl. fields ABSENT from the input, which jq
     reads as null: module, messageProperties, enrichments),
  D5 `.telemetry | map({key: .name, value: .value})`,
  D6 `from_entries` (array<{key,value}> -> keyed object; entries with
     no `value` become null-valued keys).

Spark-first expression: `F.transform` for the array map,
`F.map_from_entries` for the pivot, then extraction into the *closed*
six-sensor struct (battery, barometer, accelerometer, gyroscope,
magnetometer, geolocation) — a fixed StructType beats MapType once the
key set is closed, because struct fields prune and push down.

Fidelity notes (each asserted by tests/test_normalize_golden.py against
the reference's golden input/output pair):
- `enqueuedTime` stays a STRING through the envelope — the jq transform
  passes the nanosecond ISO-8601 text straight through; the timestamp
  CAST happens downstream in the ASA job (B9,
  reference iot-stream-analytics-query.sql:11). Spark's cast truncates
  the 9-digit fraction to microseconds, matching DATETIME2's storage.
- extreme doubles (2.3652105113135073e+305) and negative battery ints
  survive the pivot unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.functions.magnitudes import magnitude3
from azure_iot_realtime_data_pipeline_spark.functions.serialization import (
    coalesce_device_id,
    coalesce_double,
    format_iso_millis,
)

SCHEMA_LITERAL = "default@v1"

#: parse schema for raw device messages (FIXTURES.md F1, shape of
#: reference iot-central/raw-data-template.json). Scalar sensor readings
#: ride as doubles; struct-valued sensors carry no `value` field and
#: surface as null map entries — exactly the golden template's shape.
RAW_DEVICE_SCHEMA = (
    "applicationId STRING, enqueuedTime STRING, messageSource STRING, "
    "component STRING, module STRING, "
    "messageProperties MAP<STRING,STRING>, enrichments MAP<STRING,STRING>, "
    "telemetry ARRAY<STRUCT<name: STRING, value: DOUBLE>>, "
    "device STRUCT<id: STRING, name: STRING, templateId: STRING, "
    "templateName: STRING, simulated: BOOLEAN, approved: BOOLEAN, "
    "blocked: BOOLEAN, provisioned: BOOLEAN>"
)

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

_VEC = "struct<x: double, y: double, z: double>"
_GEO = "struct<lat: double, lon: double, alt: double>"


def parse_raw_device_json(raw_json: DataFrame, json_col: str = "value") -> DataFrame:
    """A2 for the ingest path: wire JSON text -> typed raw device record
    (explicit schema, never inference — streaming requires it anyway)."""
    return raw_json.select(
        F.from_json(F.col(json_col), RAW_DEVICE_SCHEMA).alias("m")
    ).select("m.*")


def telemetry_entries_to_map(telemetry_array: Column) -> Column:
    """D5+D6: array<struct<name,value>> -> map<name,value>.

    `.telemetry | map({key: .name, value: .value}) | from_entries`
    (reference iot-central/transformation.txt:10). Entries missing
    `value` pivot to null-valued keys, matching jq.
    """
    entries = F.transform(
        telemetry_array,
        lambda e: F.struct(e["name"].alias("key"), e["value"].alias("value")),
    )
    return F.map_from_entries(entries)


def normalize_raw_events(raw: DataFrame) -> DataFrame:
    """D1-D6: raw device message -> the 11-field flat wire envelope.

    Field-for-field the jq object of
    reference iot-central/transformation.txt:3-15; `enqueuedTime` is a
    string passthrough (see module docstring).
    """
    tmap = telemetry_entries_to_map(F.col("telemetry"))
    return raw.select(
        F.lit(SCHEMA_LITERAL).alias("schema"),                     # D2
        F.col("applicationId"),                                    # D4
        F.col("device.id").alias("deviceId"),                      # D3
        F.col("device.templateId").alias("templateId"),            # D3
        F.col("messageSource"),                                    # D4
        F.col("enqueuedTime"),                                     # D4 (string)
        tmap.alias("telemetry"),                                   # D5+D6
        F.col("messageProperties"),                                # D4
        F.col("enrichments"),                                      # D4
        F.col("component"),                                        # D4
        F.col("module"),                                           # D4
    )


def sensor_struct(tmap: Column) -> Column:
    """Close the dynamic telemetry map into the six-sensor struct
    (SURVEY.md §1.2: the key set is closed, so a typed struct beats
    MapType for pruning/pushdown). Scalar-feed form: vector sensors
    carried no scalar value on this wire, so their structs are null —
    matching the golden output's null accelerometer/gyroscope/
    magnetometer/geolocation."""
    return F.struct(
        tmap.getItem("battery").cast("bigint").alias("battery"),
        tmap.getItem("barometer").alias("barometer"),
        F.lit(None).cast(_VEC).alias("accelerometer"),
        F.lit(None).cast(_VEC).alias("gyroscope"),
        F.lit(None).cast(_VEC).alias("magnetometer"),
        F.lit(None).cast(_GEO).alias("geolocation"),
    )


def curated_telemetry(envelope: DataFrame) -> DataFrame:
    """The ASA Telemetry projection (B3/B4/B9/B11/C1-C3, reference
    iot-stream-analytics-query.sql:64-74 over the CTE at :8-46):
    CAST event time, flatten nested sensor paths, derive the three
    magnitudes; Anomaly flag defaults 0 (DDL DEFAULT,
    reference README.MD:173) until the stateful detector fills it."""
    t = sensor_struct(F.col("telemetry"))
    return envelope.select(
        F.col("deviceId"),
        F.col("enqueuedTime").cast("timestamp").alias("enqueuedTime"),  # B9
        t.getField("battery").cast("int").alias("battery"),
        t.getField("barometer").alias("barometer"),
        t.getField("geolocation").getField("lat").alias("latitude"),    # B4
        t.getField("geolocation").getField("lon").alias("longitude"),
        t.getField("geolocation").getField("alt").alias("altitude"),
        magnitude3(
            t.getField("accelerometer").getField("x"),
            t.getField("accelerometer").getField("y"),
            t.getField("accelerometer").getField("z"),
        ).alias("AccelMagnitude"),                                      # C1
        magnitude3(
            t.getField("gyroscope").getField("x"),
            t.getField("gyroscope").getField("y"),
            t.getField("gyroscope").getField("z"),
        ).alias("GyroMagnitude"),                                       # C2
        magnitude3(
            t.getField("magnetometer").getField("x"),
            t.getField("magnetometer").getField("y"),
            t.getField("magnetometer").getField("z"),
        ).alias("MagMagnitude"),                                        # C3
        F.lit(0).alias("Anomaly"),
    ).filter(F.col("deviceId").isNotNull())                             # B7


def powerbi_rows(curated: DataFrame) -> DataFrame:
    """The serve-path payload row (G1-G5, FIXTURES.md F5): every numeric
    null-coalesced to 0.0, deviceId to '', UTC millisecond 'Z' text
    timestamp (reference PushTelemetryFunction.cs:336-400)."""
    nums = (
        "battery",
        "barometer",
        "latitude",
        "longitude",
        "altitude",
        "AccelMagnitude",
        "GyroMagnitude",
        "MagMagnitude",
        "Anomaly",
    )
    return curated.select(
        coalesce_device_id(F.col("deviceId")).alias("deviceId"),
        format_iso_millis(F.col("enqueuedTime")).alias("enqueuedTime"),
        *[coalesce_double(F.col(c).cast("double")).alias(c) for c in nums],
    )


def parse_json_quarantine(
    df: DataFrame, json_col: str, schema: str
) -> DataFrame:
    """A2b malformed-payload quarantine for JSON ingest — the
    dead-letter split every real telemetry pipeline needs in front of
    the bronze sink (the reference's ASA job silently drops rows its
    JSON deserializer rejects; a quarantine keeps them auditable).

    from_json in its default PERMISSIVE mode NEVER yields a NULL struct
    for malformed input (it fills fields with NULL — indistinguishable
    from a legitimately-sparse payload), so detection uses the
    columnNameOfCorruptRecord channel: the parser routes the RAW
    malformed payload into `_corrupt_record` — PLUS a NULL-struct check,
    because empty/whitespace-only payloads yield a NULL struct without
    ever firing the corrupt channel (review r7 s5: they silently passed
    to the good side where json_valid('') correctly rejects). NULL
    input is NOT quarantined (no payload, nothing to audit — the A3
    bronze sink keeps it).

    Caveat for oracle writers: from_json with a STRUCT schema also
    quarantines shape mismatches ('null', '[]') that are valid JSON
    texts — a json_valid-based twin agrees only on inputs that are
    objects-or-garbage, which is what a telemetry feed produces.

    Entirely map-side (one parser expression per row, streaming-safe);
    returns the input plus (quarantined, raw) plus the parsed fields as
    `parsed_<field>` — prefixed, because a telemetry payload usually
    ECHOES its envelope's key columns and an unprefixed parse would
    collide with them (and be NULL exactly on the quarantined rows a
    caller inspects by that key)."""
    reserved = {"_p", "quarantined", "raw"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input already carries reserved column(s) {sorted(reserved)}; "
            "rename them before parse_json_quarantine"
        )
    full_schema = schema + ", _corrupt_record STRING"
    parsed = F.from_json(
        F.col(json_col),
        full_schema,
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    with_p = df.withColumn("_p", parsed)
    return (
        with_p.withColumn(
            "quarantined",
            F.col(json_col).isNotNull()
            & (
                F.col("_p").isNull()
                | F.col("_p._corrupt_record").isNotNull()
            ),
        )
        .withColumn("raw", F.col(json_col))
        .select(
            *df.columns,
            "quarantined",
            "raw",
            *[
                F.col(f"_p.{f}").alias(f"parsed_{f}")
                for f in with_p.select("_p.*").columns
                if f != "_corrupt_record"
            ],
        )
    )


def split_quarantine(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead_letter) split of a parse_json_quarantine output —
    good rows drop the audit columns, the dead-letter side keeps only
    what a replay needs: the source columns and the raw payload (the
    parsed_* fields are all-NULL on that side by construction)."""
    good = parsed.filter(~F.col("quarantined")).drop("quarantined", "raw")
    src = [
        c
        for c in parsed.columns
        if c not in ("quarantined", "raw") and not c.startswith("parsed_")
    ]
    bad = parsed.filter(F.col("quarantined")).select(*src, "raw")
    return good, bad
