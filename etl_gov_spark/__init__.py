"""etl_gov_spark — a PySpark-native analytics/ETL engine.

Re-expresses the pipeline + query capabilities of the reference
gov-data ETL platform (Airflow-based, see SURVEY.md §1) as
Spark-first declarative DataFrame plans, plus the LLM-training-data
operators (dedup, similarity search, text analysis, multimodal
plumbing) designed for 100 TB scale.
"""

from etl_gov_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
