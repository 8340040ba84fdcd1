from g_data_pipeline_spark.functions.deterministic import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)

__all__ = ["davg", "dsum", "sql_davg", "sql_dsum"]
