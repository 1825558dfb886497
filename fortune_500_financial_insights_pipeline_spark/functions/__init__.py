from fortune_500_financial_insights_pipeline_spark.functions.deterministic import davg, dsum, dsum_w

__all__ = ["dsum", "davg", "dsum_w"]
