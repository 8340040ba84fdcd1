from g_data_pipeline_spark.sources.ingest import (
    coerce_types,
    dataset_metadata,
    land_csv,
    read_csv,
)

__all__ = ["coerce_types", "dataset_metadata", "land_csv", "read_csv"]
