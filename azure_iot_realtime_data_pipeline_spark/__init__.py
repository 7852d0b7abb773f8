"""azure_iot_realtime_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
Azure IoT real-time pipeline (Humza987/Azure_IoT_Realtime_Data_Pipeline:
IoT Central export transform -> Event Hub -> Stream Analytics SQL ->
SQL tables -> timer-driven HTTP push) as an idiomatic Spark engine:

- batch + Structured Streaming DataFrame plans (Catalyst-optimized),
- stateless operator library (projection/cast/case/magnitudes/serialization),
- stateful operators (trailing event-time windows, spike/dip anomaly
  detection, watermark-based incremental consumption),
- multi-sink fan-out with a single source pass,
- LLM-data-pipeline extensions (dedup families, similarity search,
  text analysis, multimodal column plumbing) designed for 100 TB scale.

Everything is declared through the DataFrame/SQL API so Catalyst picks
physical strategies (broadcast joins, pushdown, whole-stage codegen);
Python-side code paths (Pandas UDFs) exist only where the built-ins
cannot express the semantics.
"""

from azure_iot_realtime_data_pipeline_spark.session import get_spark
from azure_iot_realtime_data_pipeline_spark.sources.batch import TABLES, load_table, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_table", "load_tables", "register_views"]

__version__ = "0.1.0"
