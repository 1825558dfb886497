"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference pipeline (Prad06/fortune-500-financial-insights-pipeline).

Everything here is idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, Arrow-vectorized Pandas UDFs only where built-ins can't express
the semantics, Structured Streaming for the streaming surface.
"""

from fortune_500_financial_insights_pipeline_spark.session import get_spark
from fortune_500_financial_insights_pipeline_spark.catalog import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]
