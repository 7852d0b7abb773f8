from azure_iot_realtime_data_pipeline_spark.functions.magnitudes import magnitude3
from azure_iot_realtime_data_pipeline_spark.functions.serialization import (
    coalesce_device_id,
    coalesce_double,
    format_iso_millis,
    row_to_json,
)

__all__ = [
    "magnitude3",
    "coalesce_double",
    "coalesce_device_id",
    "format_iso_millis",
    "row_to_json",
]
