from g_data_pipeline_spark.plans.compiler import compile_query

__all__ = ["compile_query"]
