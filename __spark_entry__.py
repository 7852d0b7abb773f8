"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     -> flagship curated-telemetry pipeline on sf0.001.
queries()        -> every implemented operator of SURVEY.md §2 (+ Phase-4
                    LLM-pipeline ops), keyed by harness name.
oracle_sql()     -> DuckDB twins (plans/oracles.py); queries absent there
                    are rows-only by design (engine-specific hashes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core ASA path re-expressed Spark-first —
    event scan -> envelope normalize -> trailing-window spike/dip anomaly
    -> broadcast-join device dimension -> curated telemetry frame
    (reference stream-analytics/iot-stream-analytics-query.sql:8-46,64-83).
    """
    from azure_iot_realtime_data_pipeline_spark.operators.windows import (
        spike_dip_score,
        trailing_window,
        with_epoch_seconds,
    )
    from azure_iot_realtime_data_pipeline_spark.sources.batch import load_table

    ev = with_epoch_seconds(load_table(spark, SF0001_DIR, "events"), "ts")
    w = trailing_window("ts_sec", key="user_id", window_seconds=3600)
    is_anom, score = spike_dip_score(F.col("value"), w)
    telemetry = ev.select(
        F.col("event_id").alias("telemetryId"),
        F.concat(F.lit("dev-"), F.col("user_id").cast("string")).alias("deviceId"),
        F.col("user_id"),
        F.col("ts").alias("enqueuedTime"),
        F.col("event_type").alias("component"),
        F.col("value"),
        score.alias("Score"),
        is_anom.alias("Anomaly"),
    ).filter(F.col("deviceId").isNotNull())

    cust = load_table(spark, SF0001_DIR, "customer").select(
        F.col("c_custkey"), F.col("c_name").alias("deviceName")
    )
    return telemetry.join(
        F.broadcast(cust), telemetry["user_id"] == cust["c_custkey"], "left"
    ).drop("c_custkey", "user_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from azure_iot_realtime_data_pipeline_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from azure_iot_realtime_data_pipeline_spark.plans.oracles import ORACLES

    return dict(ORACLES)
