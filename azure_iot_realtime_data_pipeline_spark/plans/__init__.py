from azure_iot_realtime_data_pipeline_spark.plans.oracles import ORACLES
from azure_iot_realtime_data_pipeline_spark.plans.queries import QUERIES

__all__ = ["QUERIES", "ORACLES"]
