from g_data_pipeline_spark.streaming.pipelines import (
    run_available_now,
    sessionized_counts_stream,
    sliding_counts_stream,
    stream_events_from_json,
    tumbling_counts_stream,
)

__all__ = [
    "run_available_now",
    "sessionized_counts_stream",
    "sliding_counts_stream",
    "stream_events_from_json",
    "tumbling_counts_stream",
]
