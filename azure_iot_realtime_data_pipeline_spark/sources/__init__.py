from azure_iot_realtime_data_pipeline_spark.sources.batch import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
