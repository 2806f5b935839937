"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference course repo (MP-Death30/Cours_Datalake_dwh_td_kafka).

Built from scratch on public Spark APIs only. Architecture is Spark-first:
declarative DataFrame/SQL plans optimized by Catalyst, Structured Streaming
for the speed layer, and Arrow-batched pandas UDFs only where built-ins
cannot express the semantics (see SURVEY.md section 2 for the operator
inventory this package covers).
"""

from cours_datalake_dwh_td_kafka_spark.session import get_spark

__all__ = ["get_spark"]
